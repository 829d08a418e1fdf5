"""Training smoke on real hardware: tiny model, synthetic data, N steps,
prints the loss trajectory. Validates the train step + optimizer on the
actual TPU (the multichip dryrun runs on virtual CPU devices)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(steps: int = 20):
    from v2ap_tpu.utils.jitting import enable_compile_cache, create_model
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu import config as cfglib
    from v2ap_tpu.config import TrainConfig
    from v2ap_tpu.models.cfm import CFM
    from v2ap_tpu.training import Trainer

    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, warmup_steps=2,
                                         decay_steps=1000))
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    batch = {
        "latents": r(4, 96, cfg.model.num_channels),
        "lens": jnp.full((4,), 96, jnp.int32),
        "text_embed": r(4, 96, cfg.model.dim_text),
        "context": r(4, 8, cfg.model.dim_context),
        "context_mask": jnp.ones((4, 8), bool),
    }
    losses = []
    t0 = time.perf_counter()
    for i in range(steps):
        loss, _ = trainer.train_step(jax.random.key(7), batch)
        losses.append(float(loss))
    wall = time.perf_counter() - t0
    print(f"platform={jax.devices()[0].platform} steps={steps} "
          f"first={losses[0]:.4f} last={losses[-1]:.4f} "
          f"min={min(losses):.4f} wall={wall:.1f}s")
    assert losses[-1] < losses[0], "loss did not decrease"
    print("TRAIN SMOKE OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)

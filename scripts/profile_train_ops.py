#!/usr/bin/env python
"""Capture a jax.profiler device trace of the full-size train step and print
the top XLA ops (via tensorboard_plugin_profile's xplane converter).

    python scripts/profile_train_ops.py [batch]
"""

from __future__ import annotations

import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(batch: int = 8) -> None:
    from v2ap_tpu.utils.jitting import (create_model, enable_compile_cache,
                                        model_rngs)
    enable_compile_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu.config import TrainConfig, V2APConfig
    from v2ap_tpu.models.cfm import CFM
    from v2ap_tpu.training import Trainer

    cfg = V2APConfig()
    # mirror bench_train's knobs exactly so the bench config is profilable
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, remat=True,
        fused_adaln=os.environ.get("V2AP_FUSED_ADALN", "1") == "1",
        remat_policy=os.environ.get("V2AP_REMAT_POLICY", "dots")))
    b, n, nc = batch, 736, 16
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=model_rngs(0)))
    trainer = Trainer(model, TrainConfig(
        warmup_steps=10, decay_steps=10_000,
        # match bench_train's env knobs so the b24 bench config is profilable
        # (b >= 16 only fits with mu_bf16 + full remat)
        mu_bf16=os.environ.get("V2AP_MU_BF16", "0") == "1"))

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    batch_dict = {
        "latents": r(b, n, cfg.model.num_channels),
        "lens": jnp.full((b,), n, jnp.int32),
        "text_embed": r(b, n, cfg.model.dim_text),
        "context": r(b, nc, cfg.model.dim_context),
        "context_mask": jnp.ones((b, nc), bool),
    }
    loss, _ = trainer.train_step(jax.random.key(0), batch_dict)   # compile
    print("warm loss:", float(loss))

    logdir = "/tmp/v2ap_trace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for i in range(3):
            loss, _ = trainer.train_step(jax.random.key(i + 1), batch_dict)
        _ = float(loss)

    planes = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", planes)
    if not planes:
        return
    # direct wire-format parse: the tensorboard_plugin_profile converter is
    # ABI-incompatible with the installed protobuf, and the Chrome-trace JSON
    # the profiler also emits downsamples the op lane (~40% of module wall)
    from xplane_summary import summarize
    summarize(logdir, top=30, steps=3)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)

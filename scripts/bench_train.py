#!/usr/bin/env python
"""Training-throughput benchmark on one TPU chip: flagship 12x1024 CFM,
full training step (flow-matching loss + T5 cross-attention context + AdamW
+ EMA), synthetic 10 s-window batches.

Reports steps/s, training-audio seconds per wall second, an analytic FLOP
estimate, and MFU vs the chip's bf16 peak (override with
``V2AP_TPU_PEAK_TFLOPS``; v5e ~197). The reference publishes no training
numbers (BASELINE.md) — its trainer is 2-GPU DDP with no throughput
instrumentation (trainer_multigpus_alldatas3.py:326-452) — so this records
the absolute numbers each round.

    python scripts/bench_train.py [steps] [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def matmul_param_count(model) -> int:
    """Parameters living inside matmuls/convs (the 6*P*tokens FLOP rule
    counts only these; norms/embeddings are bandwidth, not MXU FLOPs)."""
    from flax import nnx

    total = 0
    for _, node in nnx.iter_graph(model):
        if isinstance(node, (nnx.Linear, nnx.Conv)):
            k = getattr(node, "kernel", None)
            if k is not None:
                total += int(np.prod(k.shape))
    return total


def train_flops_per_step(p_matmul: int, b: int, n: int, cfg) -> float:
    """fwd+bwd ~= 3x forward. Forward ~= 2*P*tokens dense matmul FLOPs plus
    the attention quadratic term 4*b*n_tot^2*dim per layer and stream."""
    n_tot = n + cfg.model.num_registers
    attn_fwd = 0.0
    # frames tower exists at every audio depth (transformer.py:193-196)
    for dim, layers in ((cfg.model.dim, cfg.model.depth),
                        (cfg.model.dim_text, cfg.model.text_depth),
                        (cfg.model.dim_frames, cfg.model.depth)):
        attn_fwd += layers * 4.0 * b * (n_tot ** 2) * dim
    return 3.0 * (2.0 * p_matmul * b * n_tot + attn_fwd)


def main(steps: int = 8, batch: int = 4) -> None:
    from v2ap_tpu.utils.jitting import (create_model, enable_compile_cache,
                                        model_rngs)
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu.config import TrainConfig, V2APConfig
    from v2ap_tpu.models.cfm import CFM
    from v2ap_tpu.training import Trainer

    import dataclasses
    cfg = V2APConfig()
    # remat: full-size training state (f32 params + AdamW moments ~9 GB)
    # does not leave room for saved activations on a 16 GB chip
    # V2AP_FUSED_ADALN=0 A/Bs the stacked time-cond matmul (transformer.py
    # _fused_cond_gammas) against the reference's per-sub-op projections
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, remat=True,
        fused_adaln=os.environ.get("V2AP_FUSED_ADALN", "1") == "1",
        remat_policy=os.environ.get("V2AP_REMAT_POLICY", "dots")))
    b, n, nc = batch, 736, 16          # 736 latents (+32 registers = 768)
    # V2AP_RBG_DROPOUT=0 A/Bs threefry dropout masks against the hardware-RNG
    # default (utils.jitting.model_rngs; measured 1388 -> 1273 ms at b24)
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=model_rngs(0)))
    trainer = Trainer(model, TrainConfig(
        warmup_steps=10, decay_steps=10_000,
        # bf16 first moment frees ~1.5 GB for activations — needed to fit
        # batch >= 16 on one 16 GB chip (V2AP_MU_BF16=1 to enable)
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
    _ = float(loss)
    times = []
    for i in range(steps):
        t0 = time.perf_counter()
        loss, _ = trainer.train_step(jax.random.key(i + 1), batch_dict)
        _ = float(loss)                # host transfer blocks the step
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))

    p_matmul = matmul_param_count(model)
    flops = train_flops_per_step(p_matmul, b, n, cfg)
    peak = float(os.environ.get("V2AP_TPU_PEAK_TFLOPS", "197")) * 1e12
    audio_s = b * n * cfg.conditioning.frame_size / cfg.conditioning.sampling_rate
    print(f"platform={jax.devices()[0].platform} batch={b} frames={n} "
          f"matmul_params={p_matmul/1e6:.1f}M")
    print(f"step={wall*1e3:.1f}ms  steps/s={1.0/wall:.2f}  "
          f"train_audio_x_realtime={audio_s/wall:.2f}")
    print(f"est_flops/step={flops/1e12:.2f}TF  "
          f"throughput={flops/wall/1e12:.1f}TF/s  "
          f"mfu={flops/wall/peak*100:.1f}% (peak {peak/1e12:.0f}TF/s)")
    # machine-readable last line (bench.py merges these into the driver JSON)
    import json
    print(json.dumps({
        "train_step_ms": round(wall * 1e3, 1),
        "train_batch": b,
        "train_audio_x_realtime": round(audio_s / wall, 2),
        "train_mfu": round(flops / wall / peak, 3),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8,
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)

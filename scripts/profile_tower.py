#!/usr/bin/env python
"""Where does the CLIP ViT-bigG tower's non-MXU time go?

Times, on the real chip, (a) a bare matmul chain with the same FLOPs as one
bigG forward — the achievable ceiling; (b) the real tower; (c) ablations:
fused-qkv, attention without explicit transposes, params stored bf16,
int8 AQT matmuls. Prints one line per variant: ms/frame and MFU.

    python scripts/profile_tower.py [chunk]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps: int = 5) -> float:
    _ = np.asarray(fn(*args))                       # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))                   # host transfer blocks
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main(chunk: int = 64) -> None:
    from v2ap_tpu.utils.jitting import create_model, enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu.models.clip_vit import CLIPVisionModel, clip_vit_bigg

    cfg = clip_vit_bigg()
    n = cfg.num_patches + 1
    d, ff, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    peak = float(os.environ.get("V2AP_TPU_PEAK_FLOPS", 197e12))
    flops_frame = L * (8 * n * d * d + 4 * n * n * d + 4 * n * d * ff)
    tot = flops_frame * chunk

    def report(name, wall):
        print(f"{name:28s} {wall/chunk*1e3:7.2f} ms/frame   "
              f"mfu={tot/wall/peak:.3f}  ({tot/wall/1e12:.1f} TF/s)")

    rng = np.random.default_rng(0)

    # (a) bare matmul chain, same dense FLOPs (no attention quadratic term)
    x = jnp.asarray(
        rng.normal(size=(chunk * n, d)).astype(np.float32)).astype(jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(d, 4 * d)).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)      # qkv+o worth of columns
    w2 = jnp.asarray(rng.normal(size=(d, ff)).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(ff, d)).astype(np.float32) * 0.02
                     ).astype(jnp.bfloat16)

    @jax.jit
    def chain(x):
        for _ in range(L):
            y = (x @ w1)[:, :d]
            x = ((x + y) @ w2) @ w3
        return x.sum()

    bare = timeit(chain, x)
    dense_tot = chunk * L * (2 * n * d * 4 * d + 4 * n * d * ff)
    print(f"{'bare matmul chain':28s} {bare/chunk*1e3:7.2f} ms/frame   "
          f"mfu={dense_tot/bare/peak:.3f}  ({dense_tot/bare/1e12:.1f} TF/s)")

    # (b) the real tower (f32 params, bf16 compute — serving default)
    model = create_model(lambda: CLIPVisionModel(cfg, rngs=nnx.Rngs(0)))
    px = jnp.asarray(rng.integers(0, 255, (chunk, 224, 224, 3), np.uint8))

    @nnx.jit(static_argnums=())
    def fwd(m, px):
        xx = px.astype(jnp.float32) / 255.0
        return m(xx)

    report("tower f32-params", timeit(fwd, model, px))

    # (c1) params stored bf16 (halve the HBM param stream, no per-call cast)
    from v2ap_tpu.utils.jitting import cast_params
    cast_params(model, jnp.bfloat16)
    report("tower bf16-params", timeit(fwd, model, px))

    # (c2) int8 AQT matmuls on bf16-stored params
    try:
        from v2ap_tpu.utils.quantize import make_int8_dot_general
        import jax.lax as lax
        dg = make_int8_dot_general()
        for _, node in nnx.iter_graph(model):
            if isinstance(node, nnx.Linear):
                node.dot_general = dg
        report("tower int8", timeit(fwd, model, px))
        for _, node in nnx.iter_graph(model):
            if isinstance(node, nnx.Linear):
                node.dot_general = lax.dot_general
    except Exception as exc:
        print("int8 failed:", exc)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)

#!/usr/bin/env python
"""Ablate the CLIP ViT-bigG block to find where the non-MXU time goes.

Each variant runs the 48-layer loop inside ONE jit so the ~30 ms tunnel
dispatch latency amortises. Run alone: python scripts/probe_vit_ablate.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from v2ap_tpu.utils.jitting import create_model, enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu.models.clip_vit import (CLIPVisionModel, clip_vit_bigg)

    cfg = clip_vit_bigg()
    tower = create_model(
        lambda: CLIPVisionModel(cfg, rngs=nnx.Rngs(0)))
    blk = tower.blocks[0]
    b, n, d = 64, 257, cfg.hidden_size
    x = jnp.asarray(np.random.randn(b, n, d).astype(np.float32)).astype(
        jnp.bfloat16)
    L = cfg.num_layers

    def timeit(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0][..., 0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0][..., 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    graphdef, state = nnx.split(blk)

    def loop(body):
        @jax.jit
        def run(state, x):
            m = nnx.merge(graphdef, state)
            for _ in range(L):
                x = body(m, x)
            return x
        return lambda: run(state, x)

    flops_mlp = 4 * b * n * d * cfg.intermediate_size * L
    flops_qkvo = 8 * b * n * d * d * L
    flops_attn = 4 * b * n * n * d * L

    variants = {
        "full block": (lambda m, x: m(x), flops_mlp + flops_qkvo + flops_attn),
        "mlp only (x+mlp(ln2 x))": (
            lambda m, x: x + m.mlp(m.ln2(x).astype(x.dtype)), flops_mlp),
        "attn only (x+attn(ln1 x))": (
            lambda m, x: x + m.attn(m.ln1(x).astype(x.dtype)),
            flops_qkvo + flops_attn),
        "qkvo proj only": (
            lambda m, x: x + m.attn.o(m.attn.q(x) + m.attn.k(x) + m.attn.v(x)),
            flops_qkvo),
        "mlp no-ln": (lambda m, x: x + m.mlp(x), flops_mlp),
        "ln1 only": (lambda m, x: m.ln1(x).astype(x.dtype), 0),
    }
    for name, (body, fl) in variants.items():
        t = timeit(loop(body))
        tf = fl / t / 1e12 if fl else 0.0
        print(f"{name:28s} {t*1e3:8.1f} ms  {tf:6.1f} TF/s")

    # raw matmul reference at MLP shapes
    w1 = jnp.asarray(np.random.randn(d, cfg.intermediate_size), jnp.bfloat16)
    w2 = jnp.asarray(np.random.randn(cfg.intermediate_size, d), jnp.bfloat16)
    xf = x.reshape(-1, d)

    @jax.jit
    def mm(x):
        for _ in range(L):
            h = jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16)
            x = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16)
        return x

    t = timeit(lambda: mm(xf))
    print(f"{'raw mlp matmuls':28s} {t*1e3:8.1f} ms  "
          f"{flops_mlp / t / 1e12:6.1f} TF/s")


if __name__ == "__main__":
    main()

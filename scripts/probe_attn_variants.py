#!/usr/bin/env python
"""Head-to-head of CLIP ViT-bigG attention implementations, 48-layer loop in
one jit (amortises the ~30 ms tunnel dispatch). Run alone."""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from v2ap_tpu.ops.flash_attention import flash_attention

    b, n, h, dh = 64, 257, 16, 104
    d = h * dh
    L = 48
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.bfloat16)
    wq, wk, wv, wo = (jnp.asarray(rng.standard_normal((d, d)) * 0.02,
                                  jnp.bfloat16) for _ in range(4))
    bq, bk, bv, bo = (jnp.zeros((d,), jnp.float32) for _ in range(4))
    npad = 384
    scale = dh ** -0.5

    def proj(x, w, bias):
        return (jnp.dot(x, w, preferred_element_type=jnp.float32)
                + bias).astype(x.dtype)

    def split(t):
        return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

    def v_einsum(x):
        q, k, v = split(proj(x, wq, bq)), split(proj(x, wk, bk)), split(proj(x, wv, bv))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(x.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
        return x + proj(out, wo, bo)

    def v_flash_seqpad(x):
        q, k, v = split(proj(x, wq, bq)), split(proj(x, wk, bk)), split(proj(x, wv, bv))
        pad = [(0, 0), (0, 0), (0, npad - n), (0, 0)]
        q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
        mask = jnp.broadcast_to(jnp.arange(npad) < n, (b, npad))
        out = flash_attention(q, k, v, mask, scale=scale,
                              block_q=npad, block_k=npad)[:, :, :n]
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
        return x + proj(out, wo, bo)

    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    bqkv = jnp.concatenate([bq, bk, bv])

    def v_fused_dpad(x):
        qkv = proj(x, wqkv, bqkv).reshape(b, n, 3 * h, dh)
        qkv = jnp.pad(qkv, [(0, 0), (0, npad - n), (0, 0), (0, 128 - dh)])
        qkv = qkv.transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=1)
        mask = jnp.broadcast_to(jnp.arange(npad) < n, (b, npad))
        out = flash_attention(q, k, v, mask, scale=scale,
                              block_q=npad, block_k=npad)[:, :, :n, :dh]
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
        return x + proj(out, wo, bo)

    def v_fused_seqpad(x):
        qkv = proj(x, wqkv, bqkv).reshape(b, n, 3 * h, dh)
        qkv = jnp.pad(qkv, [(0, 0), (0, npad - n), (0, 0), (0, 0)])
        qkv = qkv.transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=1)
        mask = jnp.broadcast_to(jnp.arange(npad) < n, (b, npad))
        out = flash_attention(q, k, v, mask, scale=scale,
                              block_q=npad, block_k=npad)[:, :, :n]
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
        return x + proj(out, wo, bo)

    def v_fused_einsum(x):
        qkv = proj(x, wqkv, bqkv).reshape(b, n, 3 * h, dh)
        q, k, v = jnp.split(qkv, 3, axis=2)        # (b, n, h, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(x.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(b, n, d)
        return x + proj(out, wo, bo)

    def timeit(fn):
        run = jax.jit(lambda x: [fn(x) for _ in range(1)][-1])

        @jax.jit
        def loop(x):
            for _ in range(L):
                x = fn(x)
            return x
        out = loop(x)
        np.asarray(out[..., 0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = loop(x)
            np.asarray(out[..., 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for name, fn in [("einsum 3proj", v_einsum),
                     ("flash seqpad 3proj", v_flash_seqpad),
                     ("flash fused dpad128", v_fused_dpad),
                     ("flash fused seqpad", v_fused_seqpad),
                     ("einsum fused noT", v_fused_einsum)]:
        t = timeit(fn)
        print(f"{name:24s} {t*1e3:8.1f} ms")


if __name__ == "__main__":
    main()

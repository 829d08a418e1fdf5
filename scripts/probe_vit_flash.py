#!/usr/bin/env python
"""Probe: does routing CLIP ViT attention through the Pallas flash kernel
(clip_vit.py flash path) help on real TPU, and does it match the XLA path?

Run alone on the tunneled chip:  python scripts/probe_vit_flash.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, reps=3):
    fn()  # warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[..., 0, 0])  # host transfer blocks (axon)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from v2ap_tpu.ops.flash_attention import attention_reference, flash_attention

    print("backend:", jax.default_backend())

    # bigG attention shape: 64-frame chunk, 16 heads, 257 tokens, d_head 104
    for (b, h, n, d, tag) in [(64, 16, 257, 104, "bigG"),
                              (64, 16, 577, 64, "L-336")]:
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(key, (b, h, n, d), jnp.bfloat16)
                   for key in jax.random.split(key, 3))
        npad = ((n + 127) // 128) * 128
        pad = [(0, 0), (0, 0), (0, npad - n), (0, 0)]
        qp, kp, vp = (jnp.pad(t, pad) for t in (q, k, v))
        kv_mask = jnp.broadcast_to(jnp.arange(npad) < n, (b, npad))

        ref = jax.jit(lambda q, k, v: attention_reference(q, k, v))
        fl = jax.jit(lambda q, k, v, m: flash_attention(
            q, k, v, m, block_q=npad, block_k=npad)[:, :, :n])

        o_ref = ref(q, k, v)
        o_fl = fl(qp, kp, vp, kv_mask)
        drift = float(jnp.abs(o_fl.astype(jnp.float32)
                              - o_ref.astype(jnp.float32)).max())
        rms = float(jnp.sqrt(jnp.mean(jnp.square(o_ref.astype(jnp.float32)))))
        t_ref = timeit(lambda: ref(q, k, v))
        t_fl = timeit(lambda: fl(qp, kp, vp, kv_mask))
        print(f"{tag}: ref {t_ref*1e3:7.2f} ms  flash {t_fl*1e3:7.2f} ms  "
              f"max|d| {drift:.4f} (rms {rms:.3f})")

    # full tower timing (flash path picked up automatically on TPU)
    import flax.nnx as nnx
    from v2ap_tpu.models.clip_vit import CLIPVisionModel, clip_vit_bigg
    from v2ap_tpu.utils.jitting import create_model

    tower = create_model(
        lambda: CLIPVisionModel(clip_vit_bigg(), rngs=nnx.Rngs(0)))
    px = jnp.asarray(
        np.random.rand(64, 224, 224, 3).astype(np.float32))

    @nnx.jit
    def run(tower, px):
        return tower(px)

    t = timeit(lambda: run(tower, px), reps=3)
    gf = 64 * (4 * 257 * 1664**2 + 4 * 257**2 * 1664
               + 4 * 257 * 1664 * 8192) * 48 / 1e9
    print(f"tower 64-frame chunk: {t*1e3:.1f} ms "
          f"({t*1e3/64:.2f} ms/frame, {gf/t/1e3:.0f} TF/s)")


if __name__ == "__main__":
    main()

"""Micro-bench: depthwise conv1d (XLA conv) vs shift-accumulate vs banded
matmul at the serving shapes (3 streams x 12 layers = 36 calls/step)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, n=5):
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    b, n, d, k = 2, 768, 1024, 31
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, 1, d)).astype(np.float32)).astype(jnp.bfloat16)

    def conv_xla(x, w):
        return lax.conv_general_dilated(
            x, w, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=d)

    def conv_shift(x, w):
        # shift-and-accumulate on the VPU: pad then add k shifted slices
        pad = k // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        out = jnp.zeros_like(x)
        for j in range(k):
            out = out + xp[:, j: j + n, :] * w[j, 0][None, None, :]
        return out

    sync = lambda y: np.asarray(y.ravel()[:2])

    def rep(fn):
        @jax.jit
        def run(x, w):
            def body(c, _):
                return fn(c, w), None
            out, _ = jax.lax.scan(body, x, None, length=20)
            return out
        return run

    t_xla = timeit(lambda: sync(rep(conv_xla)(x, w)))
    t_shift = timeit(lambda: sync(rep(conv_shift)(x, w)))
    print(f"depthwise conv {b}x{n}x{d} k{k}, 20 reps under one jit:")
    print(f"  xla grouped conv:   {t_xla*1e3:7.2f} ms")
    print(f"  shift-accumulate:   {t_shift*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

"""Compare attention backends (pallas flash vs XLA reference) inside the
full-size transformer eval, and standalone at serving shapes."""

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
    from v2ap_tpu.ops.flash_attention import attention_reference, flash_attention

    b, h, n, d = 2, 16, 768, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)).astype(np.float32)).astype(jnp.bfloat16)

    ref = jax.jit(lambda q, k, v: attention_reference(q, k, v, softclamp=50.0))
    fl_512 = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, softclamp=50.0, block_q=1024, block_k=512))
    fl_full = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, softclamp=50.0, block_q=1024, block_k=1024))

    sync = lambda x: np.asarray(x.ravel()[:2])
    t_ref = timeit(lambda: sync(ref(q, k, v)))
    t_512 = timeit(lambda: sync(fl_512(q, k, v)))
    t_full = timeit(lambda: sync(fl_full(q, k, v)))
    print(f"attention {b}x{h}x{n}x{d} bf16, 20 reps fused:")

    # amortise dispatch: run 20 attention calls under one jit
    def rep(fn_inner):
        @jax.jit
        def run(q, k, v):
            def body(c, _):
                return fn_inner(c, k, v) * 0.5 + q * 0.5, None
            out, _ = jax.lax.scan(body, q, None, length=20)
            return out
        return run

    r_ref = rep(lambda x, k, v: attention_reference(x, k, v, softclamp=50.0))
    r_512 = rep(lambda x, k, v: flash_attention(x, k, v, softclamp=50.0,
                                                block_q=1024, block_k=512))
    r_full = rep(lambda x, k, v: flash_attention(x, k, v, softclamp=50.0,
                                                 block_q=1024, block_k=1024))
    t_rref = timeit(lambda: sync(r_ref(q, k, v)))
    t_r512 = timeit(lambda: sync(r_512(q, k, v)))
    t_rfull = timeit(lambda: sync(r_full(q, k, v)))
    print(f"  xla (single/20x):    {t_ref*1e3:7.2f} / {t_rref*1e3:7.2f} ms")
    print(f"  pallas bk512:        {t_512*1e3:7.2f} / {t_r512*1e3:7.2f} ms")
    print(f"  pallas bk-full:      {t_full*1e3:7.2f} / {t_rfull*1e3:7.2f} ms")


if __name__ == "__main__":
    main()

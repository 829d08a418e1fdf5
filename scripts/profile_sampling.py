"""Break down serving-path time on the TPU: one transformer eval, the full
25-step CFG scan, and EnCodec decode, separately. Guides kernel work."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    np.asarray(x.ravel()[:4])          # host transfer forces completion


def timeit(fn, n=3):
    fn()                               # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from v2ap_tpu.utils.jitting import enable_compile_cache, create_model
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu.config import V2APConfig, SamplerConfig
    from v2ap_tpu.models.cfm import CFM
    from v2ap_tpu.models.encodec import EncodecModel

    cfg = V2APConfig()
    b, n, nc = 1, 736, 16
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    codec = create_model(lambda: EncodecModel(rngs=nnx.Rngs(1)))
    graphdef, state = nnx.split(model)
    cgraph, cstate = nnx.split(codec)

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    x = r(b, n, cfg.model.num_channels)
    text = r(b, n, cfg.model.dim_text)
    frames = jnp.zeros((b, n, cfg.model.notes), jnp.float32)
    ctx = r(b, nc, cfg.model.dim_context)
    ctx_mask = jnp.ones((b, nc), bool)
    lat = r(b, n, cfg.model.num_channels)

    @jax.jit
    def one_eval(state, x):
        m = nnx.merge(graphdef, state)
        xb = jnp.concatenate([x, x], 0)
        return m.pred_head(xb, None, times=jnp.full((2 * b,), 0.5),
                           mask=None, text_embed=jnp.concatenate([text, text]),
                           frames_embed=jnp.concatenate([frames, frames]),
                           context=jnp.concatenate([ctx, ctx]),
                           context_mask=jnp.concatenate([ctx_mask, ctx_mask]))

    sampler = SamplerConfig(steps=25, cfg_strength=2.0)

    @jax.jit
    def full_sample(state, x0):
        m = nnx.merge(graphdef, state)
        return m.sample(x0, text_embed=text, frames_embed=frames, context=ctx,
                        context_mask=ctx_mask, mask=None, sampler=sampler)

    @jax.jit
    def decode(cstate, lat):
        c = nnx.merge(cgraph, cstate)
        return c.decode(lat)

    t_eval = timeit(lambda: sync(one_eval(state, x)))
    t_sample = timeit(lambda: sync(full_sample(state, x)))
    t_decode = timeit(lambda: sync(decode(cstate, lat)))

    audio_s = n * 320 / 24000
    print(f"one CFG transformer eval (batch 2): {t_eval*1e3:8.2f} ms")
    print(f"25-step sample (24 evals):          {t_sample*1e3:8.2f} ms "
          f"(per step {t_sample/24*1e3:.2f} ms)")
    print(f"encodec decode:                     {t_decode*1e3:8.2f} ms")
    print(f"scan overhead vs 24x single eval:   "
          f"{(t_sample - 24*t_eval)*1e3:8.2f} ms")
    print(f"sample+decode realtime factor:      "
          f"{audio_s/(t_sample+t_decode):8.2f}x")


if __name__ == "__main__":
    main()

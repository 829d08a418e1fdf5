"""Per-block timing of the transformer step at serving shapes: audio block,
text block, frames block, cross-condition, 20 reps each under one jit."""

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
    from v2ap_tpu.utils.jitting import enable_compile_cache, create_model
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.models.transformer import TriStreamTransformer
    from v2ap_tpu.ops import rope_table

    cfg = V2APConfig().model
    model = create_model(lambda: TriStreamTransformer(cfg, rngs=nnx.Rngs(0)))
    b, n = 2, 800                      # CFG batch x (768 + 32 registers)
    rng = np.random.default_rng(0)
    bf = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32)).astype(jnp.bfloat16)
    x = bf(b, n, cfg.dim)
    text = bf(b, n, cfg.dim_text)
    frames = bf(b, n, cfg.dim_frames)
    ctx = bf(b, 16, cfg.dim_context)
    cond = bf(b, cfg.dim)
    rot_a = rope_table(n, cfg.dim_head)
    rot_t = rope_table(n, cfg.text_dim_head)
    rot_f = rope_table(n, cfg.frames_dim_head)
    sync = lambda y: np.asarray(y.ravel()[:2])

    def rep20(step):
        @nnx.jit
        def run(model, h):
            def body(c, _):
                return step(model, c) * 0.5 + h * 0.5, None
            out, _ = jax.lax.scan(body, h, None, length=20)
            return out
        return run

    audio = rep20(lambda m, h: m.audio_blocks[0](
        h, None, cond=cond, rotary=rot_a, mask=None, context=ctx,
        context_mask=None))
    audio_l6 = rep20(lambda m, h: m.audio_blocks[6](
        h, h, cond=cond, rotary=rot_a, mask=None, context=ctx,
        context_mask=None))
    textb = rep20(lambda m, h: m.text_blocks[0](h, rotary=rot_t, mask=None))
    framesb = rep20(lambda m, h: m.frames_blocks[0](h, rotary=rot_f, mask=None))

    @nnx.jit
    def crossrep(model, a, t, f):
        def body(c, _):
            a2, t2, f2 = model.cross_conditions[0](c[0], c[1], c[2])
            return (a2 * 0.5 + a * 0.5, t2 * 0.5 + t * 0.5,
                    f2 * 0.5 + f * 0.5), None
        out, _ = jax.lax.scan(body, (a, t, f), None, length=20)
        return out[0]

    t_audio = timeit(lambda: sync(audio(model, x)))
    t_audio6 = timeit(lambda: sync(audio_l6(model, x)))
    t_text = timeit(lambda: sync(textb(model, text)))
    t_frames = timeit(lambda: sync(framesb(model, frames)))
    t_cross = timeit(lambda: sync(crossrep(model, x, text, frames)))

    base = 0.0
    print("20 reps under one jit (subtract ~30 ms dispatch), serving shapes:")
    print(f"  audio block (first half):  {t_audio*1e3:7.1f} ms")
    print(f"  audio block (skip half):   {t_audio6*1e3:7.1f} ms")
    print(f"  text block:                {t_text*1e3:7.1f} ms")
    print(f"  frames block:              {t_frames*1e3:7.1f} ms")
    print(f"  cross-condition:           {t_cross*1e3:7.1f} ms")
    per_layer = (t_audio + t_text + t_frames + t_cross - 4 * 0.030) / 20
    print(f"  est per layer (sum/20):    {per_layer*1e3:7.2f} ms -> x12 = "
          f"{per_layer*12*1e3:6.1f} ms/step")


if __name__ == "__main__":
    main()

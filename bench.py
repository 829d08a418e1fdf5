"""Benchmark: V2A realtime factor on one TPU chip.

Measures the full latent pipeline of the serving path — 25-step sway-Euler CFM
sampling with CFG (two branches folded into one batch-doubled forward per
step) followed by EnCodec decoding to waveform — on the flagship 12x1024
model, and reports audio-seconds per wall-second.

Baseline: the reference publishes no numbers (BASELINE.md); the north star is
>=10x realtime per v5e chip at 25 steps, so ``vs_baseline`` = value / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    from v2ap_tpu.utils.jitting import enable_compile_cache, create_model
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu.config import V2APConfig, SamplerConfig
    from v2ap_tpu.models.cfm import CFM
    from v2ap_tpu.models.encodec import EncodecModel

    cfg = V2APConfig()
    sampler = SamplerConfig(steps=25, cfg_strength=2.0, sway_sampling=True)

    b, n, nc = 1, 736, 16            # 736 latent frames + 32 registers = 768
    audio_seconds = b * n * cfg.conditioning.frame_size / cfg.conditioning.sampling_rate

    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    codec = create_model(lambda: EncodecModel(rngs=nnx.Rngs(1)))
    if os.environ.get("V2AP_BENCH_BF16_PARAMS", "1") == "1":
        from v2ap_tpu.utils.jitting import cast_params
        cast_params(model, jnp.bfloat16)   # serving: weights stream as bf16

    graphdef, state = nnx.split(model)
    cgraph, cstate = nnx.split(codec)

    @jax.jit
    def generate(state, cstate, x0, text, frames, ctx, ctx_mask):
        m = nnx.merge(graphdef, state)
        latents = m.sample(x0, text_embed=text, frames_embed=frames,
                           context=ctx, context_mask=ctx_mask, mask=None,
                           sampler=sampler)
        c = nnx.merge(cgraph, cstate)
        return c.decode(latents)

    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    x0 = r(b, n, cfg.model.num_channels)
    text = r(b, n, cfg.model.dim_text)
    frames = jnp.zeros((b, n, cfg.model.notes), jnp.float32)
    ctx = r(b, nc, cfg.model.dim_context)
    ctx_mask = jnp.ones((b, nc), bool)

    # compile + warmup (block via host transfer: block_until_ready on remote
    # axon arrays does not reliably block)
    wav = generate(state, cstate, x0, text, frames, ctx, ctx_mask)
    _ = np.asarray(wav[:, :8])

    times = []
    for i in range(3):
        x0_i = x0 + float(i) * 1e-6       # distinct input each run
        t0 = time.perf_counter()
        wav = generate(state, cstate, x0_i, text, frames, ctx, ctx_mask)
        _ = np.asarray(wav[:, :8])        # forces full execution
        times.append(time.perf_counter() - t0)

    wall = float(np.median(times))
    rtf = audio_seconds / wall

    result = {
        "metric": "v2a_realtime_factor_25step_cfg_encodec",
        "value": round(rtf, 3),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 10.0, 3),
    }

    # throughput mode (clips riding the batch axis): opt-in, extra keys only
    tb = int(os.environ.get("V2AP_BENCH_THROUGHPUT_BATCH", "0"))
    if tb > 1:
        x0b = jnp.tile(x0, (tb, 1, 1))
        textb = jnp.tile(text, (tb, 1, 1))
        framesb = jnp.tile(frames, (tb, 1, 1))
        ctxb = jnp.tile(ctx, (tb, 1, 1))
        ctxmb = jnp.tile(ctx_mask, (tb, 1))
        wavb = generate(state, cstate, x0b, textb, framesb, ctxb, ctxmb)
        _ = np.asarray(wavb[:, :8])
        t0 = time.perf_counter()
        wavb = generate(state, cstate, x0b + 1e-6, textb, framesb, ctxb, ctxmb)
        _ = np.asarray(wavb[:, :8])
        tput_wall = time.perf_counter() - t0
        clip_s = n * cfg.conditioning.frame_size / cfg.conditioning.sampling_rate
        result["throughput_batch"] = tb
        result["clips_per_min"] = round(tb / tput_wall * 60.0, 2)
        result["throughput_x_realtime"] = round(tb * clip_s / tput_wall, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()

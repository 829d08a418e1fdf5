"""Quantify CFM sampling drift across precisions: f32 vs bf16 (serving
default) vs int8 (V2AP_INT8_CFM opt-in).

Companion to probe_tower_drift.py: the tower decision used "int8 drift vs
the drift the accepted bf16 default already incurs" — this measures the same
ratio for the CFM core so the int8-CFM default question rests on evidence,
not vibes. Unlike the frozen towers, the CFM is the TRAINED generative core,
so the bar for flipping its default is higher.

Runs the full-size flagship (12x1024) on few sway-Euler steps (drift ratios
are roughly step-independent; absolute drift grows with steps). CPU-runnable:
V2AP_PROBE_CPU=1 V2AP_PROBE_STEPS=4. Prints one JSON line with rel-rms drift
of the sampled latents vs the f32 run.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    if os.environ.get("V2AP_PROBE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses
    import jax.numpy as jnp
    from flax import nnx

    from v2ap_tpu.config import SamplerConfig, V2APConfig
    from v2ap_tpu.models.cfm import CFM
    from v2ap_tpu.utils.jitting import (create_model, enable_compile_cache,
                                        cast_params)
    from v2ap_tpu.utils.quantize import quantize_linears_int8

    enable_compile_cache()
    steps = int(os.environ.get("V2AP_PROBE_STEPS", "4"))
    cfg = V2APConfig()
    sampler = SamplerConfig(steps=steps, cfg_strength=2.0, sway_sampling=True)

    b, n = 1, 384
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    x0 = r(b, n, cfg.model.num_channels)
    cond = dict(text_embed=r(b, n, cfg.model.dim_text),
                frames_embed=jnp.zeros((b, n, cfg.model.notes), jnp.float32),
                context=r(b, 8, cfg.model.dim_context),
                context_mask=jnp.ones((b, 8), bool), mask=None)

    def build(dtype: str):
        mcfg = dataclasses.replace(cfg.model, dtype=dtype)
        return create_model(lambda: CFM(mcfg, cfg.conditioning,
                                        with_video2roll=False,
                                        rngs=nnx.Rngs(0)))

    def sample(model):
        t0 = time.perf_counter()
        out = np.asarray(nnx.jit(
            lambda m, x0, c, s: m.sample(x0, sampler=s, **c),
            static_argnames="s")(model, x0, cond, sampler), np.float32)
        return out, round(time.perf_counter() - t0, 1)

    result: dict = {"steps": steps}
    f32_out, result["f32_s"] = sample(build("float32"))
    denom = float(np.sqrt(np.mean(f32_out ** 2)))

    model = build("bfloat16")
    bf16_out, result["bf16_s"] = sample(model)
    result["bf16_drift"] = round(
        float(np.sqrt(np.mean((bf16_out - f32_out) ** 2))) / denom, 5)

    # serving also casts params to bf16 (bench.py V2AP_BENCH_BF16_PARAMS=1)
    cast_params(model, jnp.bfloat16)
    bf16p_out, result["bf16_params_s"] = sample(model)
    result["bf16_params_drift"] = round(
        float(np.sqrt(np.mean((bf16p_out - f32_out) ** 2))) / denom, 5)

    quantize_linears_int8(model)
    int8_out, result["int8_s"] = sample(model)
    result["int8_drift"] = round(
        float(np.sqrt(np.mean((int8_out - f32_out) ** 2))) / denom, 5)

    print(json.dumps(result))


if __name__ == "__main__":
    main()

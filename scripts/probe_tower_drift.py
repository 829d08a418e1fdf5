"""Quantify CLIP ViT-bigG conditioning-feature drift across serving
precisions: f32 (reference numerics) vs bf16 (current serving default) vs
int8 AQT dynamic-range variants.

Purpose (VERDICT r2 next #1): decide whether int8 towers can be the serving
default. End-audio drift is not measurable offline (zero-init cross-condition
gates + no trained weights), so the defensible bound is: how does int8's
conditioning drift compare to the f32->bf16 drift already accepted as the
serving default?

Variants probed:
  bf16       bf16 compute dtype, f32 params/LN          (current default)
  int8       bf16 params + AQT int8 on every nnx.Linear (current opt-in)
  int8_mlp   int8 on the ViT MLP Linears only (qkvo + projection stay bf16)
  int8_skip_last4  int8 everywhere except the last 4 encoder layers

Prints one JSON line with rel-rms drift of the 1280-d projected features vs
the f32 tower, plus per-variant tower wall-clock on the same 64-frame chunk.
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
    import jax.numpy as jnp
    from flax import nnx

    from v2ap_tpu.utils.jitting import create_model, enable_compile_cache
    from v2ap_tpu.models.clip_vit import CLIPVisionModel, device_normalize, \
        clip_vit_bigg
    from v2ap_tpu.utils.quantize import make_int8_dot_general

    enable_compile_cache()
    import dataclasses
    ccfg = clip_vit_bigg()                       # serving default: bf16 compute
    f32_cfg = dataclasses.replace(ccfg, dtype="float32")
    # same seed -> identical f32 params; only the compute dtype differs
    tower = create_model(lambda: CLIPVisionModel(f32_cfg, rngs=nnx.Rngs(3)))

    # 64 frames of the bench clip's statistics (rolling random base)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    nf = int(os.environ.get("V2AP_PROBE_FRAMES", "64"))
    px = np.stack([np.roll(base, 3 * i, axis=1) for i in range(nf)])
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], jnp.float32)
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], jnp.float32)
    dev = jnp.asarray(px)

    fwd = nnx.jit(lambda m, p: m(device_normalize(p, mean, std)))

    reps = 0 if os.environ.get("V2AP_PROBE_CPU") == "1" else 3

    def run(label: str):
        t0 = time.perf_counter()
        out = np.asarray(fwd(tower, dev), np.float32)
        times = [time.perf_counter() - t0]          # compile-inclusive
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(fwd(tower, dev))
            times.append(time.perf_counter() - t0)
        return out, float(np.median(times[-max(reps, 1):]))

    int8_dg = make_int8_dot_general()
    lax_dg = jax.lax.dot_general

    def set_dg(predicate) -> int:
        n = 0
        for path, node in nnx.iter_graph(tower):
            if isinstance(node, nnx.Linear):
                use = predicate(tuple(str(p) for p in path))
                node.dot_general = int8_dg if use else lax_dg
                n += int(use)
        return n

    result: dict = {}
    f32_feats, result["f32_s"] = run("f32")
    denom = float(np.sqrt(np.mean(f32_feats ** 2)))

    def drift(feats) -> float:
        return round(float(np.sqrt(np.mean((feats - f32_feats) ** 2))) / denom,
                     5)

    # serving default: bf16 COMPUTE dtype (f32 params cast inside ops, LN in
    # f32 — models/clip_vit.py) — rebuild with the same seed
    tower = create_model(lambda: CLIPVisionModel(ccfg, rngs=nnx.Rngs(3)))
    fwd = nnx.jit(lambda m, p: m(device_normalize(p, mean, std)))
    feats, result["bf16_s"] = run("bf16")
    result["bf16_drift"] = drift(feats)

    n = set_dg(lambda p: True)
    feats, result["int8_s"] = run("int8")
    result["int8_drift"] = drift(feats)
    result["int8_linears"] = n

    n = set_dg(lambda p: "mlp" in p)
    feats, result["int8_mlp_s"] = run("int8_mlp")
    result["int8_mlp_drift"] = drift(feats)
    result["int8_mlp_linears"] = n

    last4 = {str(i) for i in range(ccfg.num_layers - 4, ccfg.num_layers)}
    n = set_dg(lambda p: not (set(p) & last4) and "projection" not in p)
    feats, result["int8_skip_last4_s"] = run("int8_skip_last4")
    result["int8_skip_last4_drift"] = drift(feats)
    result["int8_skip_last4_linears"] = n

    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Bound the conditioning drift of frame-subsampled serving
(``ConditioningConfig.frame_stride`` / V2AP_FRAME_STRIDE).

Stride-N serving encodes every Nth decoded frame through the vision tower and
interpolates features between the anchors (pipelines/generate.py). Because the
tower is applied per frame, the stride-N anchor features are EXACTLY the
stride-N subset of the full encode — so one full tower pass suffices and the
probe isolates the only source of drift: the interpolation/aliasing of the
75 Hz conditioning tensor the CFM actually consumes (reference interp:
e2_tts_crossatt3.py:1800-1813).

Method: encode `V2AP_PROBE_FRAMES` frames of a smooth synthetic clip with the
real CLIP ViT-bigG (f32 numerics — the drift measured here composes with the
tower-precision drift from probe_tower_drift.py), build the reference
conditioning (stride 1, nearest interp), then for each stride x {lerp,
nearest} build the subsampled conditioning and report rel-rms drift.

Calibration anchors from prior probes (NOTES.md): bf16 tower compute drifts
1.39% rel-rms vs f32 (the long-accepted serving default), int8 towers 2.95%
(accepted r3 default). A stride whose drift lands at or below those numbers
costs nothing the serving path hasn't already accepted.

Prints one JSON line.
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

    from v2ap_tpu.data.video_io import interp_indices_clip, interp_weights_clip
    from v2ap_tpu.models.clip_vit import (CLIPVisionModel, clip_vit_bigg,
                                          clip_tiny_test, device_normalize)
    from v2ap_tpu.utils.jitting import create_model, enable_compile_cache

    enable_compile_cache()
    import dataclasses
    tiny = os.environ.get("V2AP_PROBE_TINY") == "1"
    ccfg = clip_tiny_test() if tiny else dataclasses.replace(
        clip_vit_bigg(), dtype="float32")
    tower = create_model(lambda: CLIPVisionModel(ccfg, rngs=nnx.Rngs(3)))

    # smooth video-like frames: sub-pixel translation of a low-frequency base
    # (real video is temporally smooth; per-pixel iid noise would be the
    # adversarial worst case and no codec ships it)
    rng = np.random.default_rng(0)
    res = ccfg.image_size
    fps = 24.0
    nf = int(os.environ.get("V2AP_PROBE_FRAMES", "48"))
    base = rng.integers(0, 255, (res, 2 * res, 3)).astype(np.float32)
    import cv2
    base = cv2.GaussianBlur(base, (0, 0), 4.0)   # low-pass: codec-like content
    px = np.stack([
        np.clip(np.roll(base, 2 * i, axis=1)[:, :res], 0, 255)
        for i in range(nf)]).astype(np.uint8)
    duration = nf / fps

    from v2ap_tpu.models.clip_vit import CLIP_MEAN, CLIP_STD
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    fwd = nnx.jit(lambda m, p: m(device_normalize(p, mean, std)))
    t0 = time.perf_counter()
    feats = np.asarray(fwd(tower, jnp.asarray(px)))
    wall = time.perf_counter() - t0

    n = int(round(duration * 75))                      # latent frames @75 Hz
    ref = feats[interp_indices_clip(len(feats), duration, n)]
    denom = float(np.sqrt(np.mean(ref ** 2))) or 1.0

    out = {"frames": nf, "latent_frames": n, "tower_wall_s": round(wall, 3),
           "tiny": tiny}
    for stride in (2, 3, 4):
        sub = feats[::stride]
        i0, i1, w = interp_weights_clip(len(sub), duration, n)
        lerp = sub[i0] * (1.0 - w[:, None]) + sub[i1] * w[:, None]
        near = sub[interp_indices_clip(len(sub), duration, n)]
        out[f"stride{stride}_lerp_rel_rms"] = round(
            float(np.sqrt(np.mean((lerp - ref) ** 2))) / denom, 4)
        out[f"stride{stride}_nearest_rel_rms"] = round(
            float(np.sqrt(np.mean((near - ref) ** 2))) / denom, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

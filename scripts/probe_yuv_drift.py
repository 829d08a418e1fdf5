"""Quantify conditioning-feature drift from YUV 4:2:0 pixel shipping.

V2AP_SHIP_YUV420=1 halves the host->device frame transfer (1.5 B/px) by
re-subsampling chroma after resize and reconstructing RGB on device
(models/clip_vit.py pack_yuv420/unpack_yuv420). The source video is h264
4:2:0, so the information loss is a chroma re-resample on top of the uint8
rounding the RGB path already incurs — but the error is content-dependent,
so this probe reports drift on BOTH:

  * noise frames (rolling random base — the bench clip; worst case for
    chroma subsampling, no spatial correlation), and
  * smooth frames (gradients + soft shapes — natural-video-like statistics).

Drift is rel-rms of the projected features vs the SAME tower fed the
RGB-uint8-shipped pixels (the current serving default input path), i.e. it
isolates exactly what the wire-format change adds. Also prints the host-side
pack cost per 64 frames (the pack must cost less than the upload it saves).

CPU-runnable: V2AP_PROBE_CPU=1 V2AP_PROBE_FRAMES=2 python scripts/probe_yuv_drift.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def smooth_frames(nf: int, size: int = 224) -> np.ndarray:
    """Natural-video-like synthetic frames: gradients + moving soft blobs."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    frames = np.empty((nf, size, size, 3), np.uint8)
    for i in range(nf):
        t = i / max(nf, 1)
        r = 0.5 + 0.4 * np.sin(2 * np.pi * (xx + t))
        g = 0.5 + 0.4 * np.cos(2 * np.pi * (yy - t))
        blob = np.exp(-(((xx - 0.3 - 0.4 * t) ** 2 +
                         (yy - 0.5) ** 2) / 0.02))
        b = 0.3 + 0.6 * blob
        frames[i] = np.clip(np.stack([r, g, b], -1) * 255.0 + 0.5,
                            0, 255).astype(np.uint8)
    return frames


def main() -> None:
    import jax
    if os.environ.get("V2AP_PROBE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import nnx

    from v2ap_tpu.utils.jitting import create_model, enable_compile_cache
    from v2ap_tpu.models.clip_vit import (
        CLIPVisionModel, clip_vit_bigg, device_normalize, pack_yuv420,
        unpack_yuv420,
    )

    enable_compile_cache()
    import dataclasses
    ccfg = dataclasses.replace(clip_vit_bigg(), dtype="float32")
    tower = create_model(lambda: CLIPVisionModel(ccfg, rngs=nnx.Rngs(3)))
    mean = jnp.asarray([0.48145466, 0.4578275, 0.40821073], jnp.float32)
    std = jnp.asarray([0.26862954, 0.26130258, 0.27577711], jnp.float32)

    fwd_rgb = nnx.jit(lambda m, p: m(device_normalize(p, mean, std)))
    fwd_yuv = nnx.jit(lambda m, y, uv: m(unpack_yuv420(y, uv, mean, std)))

    nf = int(os.environ.get("V2AP_PROBE_FRAMES", "64"))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    cases = {
        "noise": np.stack([np.roll(base, 3 * i, axis=1) for i in range(nf)]),
        "smooth": smooth_frames(nf),
    }

    result: dict = {"frames": nf}
    for label, px in cases.items():
        ref = np.asarray(fwd_rgb(tower, jnp.asarray(px)), np.float32)
        t0 = time.perf_counter()
        y, uv = pack_yuv420(px)
        result[f"pack_s_{label}"] = round(time.perf_counter() - t0, 4)
        feats = np.asarray(fwd_yuv(tower, jnp.asarray(y), jnp.asarray(uv)),
                           np.float32)
        denom = float(np.sqrt(np.mean(ref ** 2))) or 1.0
        result[f"yuv_drift_{label}"] = round(
            float(np.sqrt(np.mean((feats - ref) ** 2))) / denom, 5)
        # pixel-level reconstruction error (fraction of full scale)
        rec = np.asarray(unpack_yuv420(jnp.asarray(y), jnp.asarray(uv),
                                       jnp.zeros(3), jnp.ones(3)))
        pix = np.asarray(px, np.float32) / 255.0
        result[f"pix_rms_{label}"] = round(
            float(np.sqrt(np.mean((rec - pix) ** 2))), 5)
    result["bytes_ratio"] = 0.5
    print(json.dumps(result))


if __name__ == "__main__":
    main()

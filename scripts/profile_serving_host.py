#!/usr/bin/env python
"""Break down the cold-serving host path: decode / preprocess / upload /
tower / sampler, each timed separately on the bench clip. Run alone (one
jax process at a time on the tunneled chip).

    python scripts/profile_serving_host.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import tempfile
    from bench import _write_video
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.pipelines.generate import V2APipeline
    from v2ap_tpu.data import video_io
    from v2ap_tpu.models.clip_vit import preprocess_frames

    video = os.path.join(tempfile.gettempdir(), "v2ap_bench_clip.mp4")
    if not os.path.exists(video):
        _write_video(video)

    t0 = time.perf_counter()
    frames, dur = video_io.read_video_frames(video)
    t_decode = time.perf_counter() - t0
    print(f"decode: {t_decode:.3f}s  ({len(frames)} frames {frames.shape[1:]})")

    t0 = time.perf_counter()
    px = preprocess_frames(frames, 224, normalize=False)
    t_pre = time.perf_counter() - t0
    print(f"preprocess (PIL, threaded): {t_pre:.3f}s  "
          f"({px.nbytes/1e6:.1f} MB uint8)")

    # cv2 alternative
    try:
        import cv2
        t0 = time.perf_counter()
        out = np.empty_like(px)
        for i in range(len(frames)):
            h, w = frames[i].shape[:2]
            short = min(w, h)
            nw, nh = round(w * 224 / short), round(h * 224 / short)
            r = cv2.resize(frames[i], (nw, nh), interpolation=cv2.INTER_CUBIC)
            left, top = (nw - 224) // 2, (nh - 224) // 2
            out[i] = r[top:top + 224, left:left + 224]
        t_cv2 = time.perf_counter() - t0
        drift = np.abs(out.astype(np.int16) - px.astype(np.int16)).mean()
        print(f"preprocess (cv2, serial): {t_cv2:.3f}s  "
              f"mean |pixel delta| vs PIL: {drift:.2f}/255")
    except ImportError:
        pass

    # upload (blocking measure)
    cfg = V2APConfig()
    pipe = V2APipeline(cfg, seed=0)
    dev = jnp.asarray(px[:64])
    _ = np.asarray(dev.sum())       # force
    t0 = time.perf_counter()
    dev_all = jnp.asarray(px)
    _ = np.asarray(dev_all[0, 0, 0, 0])  # block until materialised
    t_up = time.perf_counter() - t0
    print(f"upload {px.nbytes/1e6:.1f} MB: {t_up:.3f}s  "
          f"({px.nbytes/1e6/t_up:.0f} MB/s)")

    # full cold pipeline call with per-stage timings
    import dataclasses
    pipe.cfg = pipe.cfg.replace(conditioning=dataclasses.replace(
        pipe.cfg.conditioning, feature_cache=False))
    pipe.generate(video, "", steps=25, seed=0)      # compile
    for rep in range(2):
        t0 = time.perf_counter()
        wav, sr = pipe.generate(video, "", steps=25, seed=rep + 1)
        wall = time.perf_counter() - t0
        print(f"cold e2e rep{rep}: {wall:.3f}s  x_rt={len(wav)/sr/wall:.2f}  "
              f"stages={ {k: round(v, 3) for k, v in pipe.last_timings.items()} }")


if __name__ == "__main__":
    main()

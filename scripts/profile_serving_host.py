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

    # device-only tower wall: pixels pre-staged, so this is the pure
    # vision-tower compute a real host cannot overlap away
    tower = pipe.towers[0]
    dev_px = jnp.asarray(px[:64])
    mean = jnp.asarray(tower.mean, jnp.float32)
    std = jnp.asarray(tower.std, jnp.float32)
    _ = np.asarray(pipe._tower_fwd(tower.model, dev_px, mean, std))  # compile
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(pipe._tower_fwd(tower.model, dev_px, mean, std))
        reps.append(time.perf_counter() - t0)
    tower_s_per_frame = float(np.median(reps)) / 64.0
    n_encoded = (len(frames) + pipe._frame_stride - 1) // pipe._frame_stride
    t_tower_dev = tower_s_per_frame * n_encoded
    print(f"tower (device, stride {pipe._frame_stride}): {t_tower_dev:.3f}s "
          f"for {n_encoded} frames ({tower_s_per_frame*1e3:.1f} ms/frame)")

    # full cold pipeline call with per-stage timings
    import dataclasses
    pipe.cfg = pipe.cfg.replace(conditioning=dataclasses.replace(
        pipe.cfg.conditioning, feature_cache=False))
    pipe.generate(video, "", steps=25, seed=0)      # compile
    walls = []
    for rep in range(2):
        t0 = time.perf_counter()
        wav, sr = pipe.generate(video, "", steps=25, seed=rep + 1)
        wall = time.perf_counter() - t0
        walls.append(wall)
        print(f"cold e2e rep{rep}: {wall:.3f}s  x_rt={len(wav)/sr/wall:.2f}  "
              f"stages={ {k: round(v, 3) for k, v in pipe.last_timings.items()} }")
    # one stage-synced rep: boundaries serialised so the sampler/decode split
    # is honest (on axon, async device work otherwise drains inside the
    # wrong stage — see bench.py)
    os.environ["V2AP_STAGE_SYNC"] = "1"
    try:
        pipe.generate(video, "", steps=25, seed=9)   # sync-path compile
        t0 = time.perf_counter()
        wav, sr = pipe.generate(video, "", steps=25, seed=10)
        sync_wall = time.perf_counter() - t0
    finally:
        os.environ.pop("V2AP_STAGE_SYNC", None)
    stages = {k: round(float(v), 3) for k, v in pipe.last_timings.items()}
    audio_s = len(wav) / sr

    # ---- real-host projection, as data (VERDICT r4 weak #5 / next-step #7):
    # on a non-tunneled multi-core host, decode + preprocess + upload
    # pipeline AGAINST device compute (towers run chunk-by-chunk while the
    # host readies the next chunk), so projected cold wall ~= max(host
    # media path, device path) + sampler/decode, with the device path the
    # floor this repo can still optimise. The tunneled 1-core measurement
    # serialises all of it; both numbers ride in the JSON so the projection
    # is reproducible from the artifact alone.
    t_sample = stages.get("sample_decode_s", 0.0)
    host_media = t_decode + t_pre
    device_path = t_tower_dev + t_sample
    projected_wall = max(host_media, t_tower_dev) + t_sample
    import json
    print(json.dumps({
        "audio_seconds": round(audio_s, 2),
        "measured_cold_wall_s": round(float(np.median(walls)), 3),
        "measured_cold_x_realtime": round(
            audio_s / float(np.median(walls)), 2),
        "sync_wall_s": round(sync_wall, 3),
        "host_decode_s": round(t_decode, 3),
        "host_preprocess_s": round(t_pre, 3),
        "upload_s": round(t_up, 3),
        "upload_mb_per_s": round(px.nbytes / 1e6 / t_up, 1),
        "tower_device_s": round(t_tower_dev, 3),
        "sample_decode_s": round(t_sample, 3),
        "stage_split": stages,
        "projected_realhost_wall_s": round(projected_wall, 3),
        "projected_realhost_cold_x_realtime": round(
            audio_s / projected_wall, 2) if projected_wall > 0 else None,
        "projection_model": "max(decode+preprocess, tower_device) + "
                            "sample_decode; upload overlapped (PCIe)",
    }), flush=True)


if __name__ == "__main__":
    main()

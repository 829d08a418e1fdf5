"""Interleaved A/B probe: fused decode+strips vs the legacy two-pass piano
path, on the real serving pipeline (V2P cold, full-size towers).

The V2P cold number is the noisiest bench key on this tunneled host
(r4: 2.5-3.4x), so single-slot comparisons lie; this probe alternates the
two variants back-to-back within each rep (the methodology that resolved the
r3s4 int8-cold artifact, scripts/probe_cold_int8.py).

Variant A (fused): video_io.read_video_frames_and_strips — one codec pass
emitting full-rate gray strips + tower-stride RGB.
Variant B (legacy proxy): full-rate decode -> piano_preprocess -> host-side
stride, i.e. the pre-r4s2 shape (in fact slightly kinder: the old code also
materialised the full-rate RGB array into the tower path).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def legacy_read_and_strips(path, step=1, width=900, height=100, strip_step=1):
    from v2ap_tpu.data.video_io import piano_preprocess, read_video_frames
    frames, dur = read_video_frames(path)
    if frames is None:
        return None, None, None, None
    strips = piano_preprocess(frames[::strip_step], width, height)
    return frames[::step], strips, dur, len(frames)


def main() -> None:
    import dataclasses

    from bench import _write_video
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.data import video_io
    from v2ap_tpu.pipelines.generate import V2APipeline
    from v2ap_tpu.utils.jitting import enable_compile_cache

    enable_compile_cache()
    video = os.path.join(tempfile.gettempdir(), "v2ap_bench_clip.mp4")
    if not os.path.exists(video) and not _write_video(video):
        print("no video writer")
        return
    cfg = V2APConfig()
    cfg = cfg.replace(conditioning=dataclasses.replace(
        cfg.conditioning, feature_cache=False))
    pipe = V2APipeline(cfg, seed=0)

    fused = video_io.read_video_frames_and_strips
    variants = {"fused": fused, "legacy": legacy_read_and_strips}

    def run(name, seed):
        video_io.read_video_frames_and_strips = variants[name]
        t0 = time.perf_counter()
        wav, sr = pipe.generate(video, prompt="", steps=25, piano=True,
                                seed=seed)
        wall = time.perf_counter() - t0
        return len(wav) / sr / wall, wall, dict(pipe.last_timings)

    # warm both (compile shared; only the host path differs)
    run("fused", 0)
    run("legacy", 0)

    reps = int(os.environ.get("PROBE_REPS", "4"))
    acc = {k: [] for k in variants}
    stages = {k: [] for k in variants}
    for rep in range(reps):
        order = ["fused", "legacy"] if rep % 2 == 0 else ["legacy", "fused"]
        for name in order:
            rtf, wall, t = run(name, rep + 1)
            acc[name].append(rtf)
            stages[name].append(t)
            print(f"rep{rep} {name:6s} rtf={rtf:.3f} wall={wall:.3f} "
                  f"decode={t.get('decode_s', 0):.3f} "
                  f"video_encode={t.get('video_encode_s', 0):.3f} "
                  f"sample={t.get('sample_decode_s', 0):.3f}", flush=True)
    for name in variants:
        v = acc[name]
        print(f"{name}: median {np.median(v):.3f} "
              f"min {min(v):.3f} max {max(v):.3f} n={len(v)}")
    video_io.read_video_frames_and_strips = fused


if __name__ == "__main__":
    main()

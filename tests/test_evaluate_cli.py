"""scripts/evaluate.py end to end on CPU: tiny pipeline, synthetic scp,
FAD/IS/KL against a self-paired reference dir."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_pipeline import write_synthetic_video


@pytest.mark.slow
def test_evaluate_cli_tiny_with_metrics(tmp_path):
    video = str(tmp_path / "clip.mp4")
    if not write_synthetic_video(video, frames=8, fps=4):
        pytest.skip("cv2 writer unavailable")
    scp = tmp_path / "eval.scp"
    scp.write_text(f"{video}\ta synthetic test clip\n")
    out = tmp_path / "out"

    # the subprocess must not touch the (possibly tunneled) TPU — the axon
    # sitecustomize ignores JAX_PLATFORMS, so the CLI's V2AP_PROBE_CPU knob
    # (utils.jitting.force_cpu_if_requested) is the off-TPU switch
    env = dict(os.environ, V2AP_PROBE_CPU="1")
    env.pop("XLA_FLAGS", None)
    script = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "evaluate.py")
    r = subprocess.run(
        [sys.executable, script, "--tiny", "--scp", str(scp), "--out",
         str(out), "--steps", "2"],
        capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out / "summary.json").read_text())
    assert summary["failed"] == 0
    assert summary["succeeded"] >= 1
    wavs = [p for p in os.listdir(out) if p.endswith(".wav")]
    assert wavs

    # second pass: score the generated wavs against themselves -> FAD ~ 0,
    # paired KL ~ 0 (exercises the PANN joint embedder + metric plumbing)
    out2 = tmp_path / "out2"
    r = subprocess.run(
        [sys.executable, script, "--tiny", "--scp", str(scp), "--out",
         str(out2), "--steps", "2", "--ref-dir", str(out)],
        capture_output=True, text=True, timeout=1200, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads((out2 / "summary.json").read_text())
    if "fad_error" in summary:
        pytest.skip(f"metric path unavailable: {summary['fad_error']}")
    # same seed + same pipeline -> identical wavs -> FAD/KL vanish
    assert summary["fad"] == pytest.approx(0.0, abs=1e-3)
    assert summary["kl_softmax"] == pytest.approx(0.0, abs=1e-4)
    assert np.isfinite(summary["is_mean"])

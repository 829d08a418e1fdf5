"""The "weights day" runbook rehearsal (scripts/weights_day.py --dry-run):
convert -> audit -> forward smoke -> orbax round trip over all four
reference variants, plus the int8-gate and reflow-distill stage hooks, all
at tiny scale. The real checkpoints are LFS stubs in this environment
(VERDICT r4 missing #1), so this pins the whole chain the day they appear —
strict=False partial-load semantics per /root/reference/src/
inference_v2a.py:117-124.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_weights_day_dry_run(tmp_path):
    env = dict(os.environ)
    env["V2AP_PROBE_CPU"] = "1"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "weights_day.py"),
         "--dry-run", "--workdir", str(tmp_path)],
        capture_output=True, text=True, timeout=1500, env=env)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["dry_run_ok"] is True
    stages = summary["stages"]
    for variant in ("crossatt", "crossatt6", "crossatt3", "crossatt3_2"):
        st = stages[f"convert_{variant}"]
        assert st["ok"], (variant, st)
        assert st["unexpected"] == []
    # crossatt6's FactorCL critic params are aux-classified, never a failure
    assert stages["convert_crossatt6"]["aux_unconsumed"] > 0
    assert stages["distill"]["ok"], stages["distill"]
    assert stages["int8_gate"]["ok"], stages["int8_gate"]

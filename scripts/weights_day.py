#!/usr/bin/env python
"""One-command "weights day" runbook: everything that must happen the day
real reference checkpoints (snapshot_download("lshzhm/Video-to-Audio-and-
Piano") + HF encoder snapshots) finally land, chained so nothing is
improvised:

    convert -> audit -> forward smoke -> int8 end-audio gate ->
    reflow distillation -> bench

Real run:

    python scripts/weights_day.py --ckpt piano5_4_2_8000.pt --out ckpts/v2ap \
        --encodec /hf/facebook-encodec_24khz --t5 /hf/google-flan-t5-large \
        --clip /hf/IP-Adapter/image_encoder --videos tests/VGGSound/video \
        [--notes 51] [--distill-steps 2000] [--bench]

Dry run (CI-tested, tests/test_weights_day.py): synthesizes reference-layout
state dicts for all four model variants (utils/reference_manifest.py derives
the layouts from the executed reference constructors), saves them as real
.pt files, and drives every stage end to end at tiny scale on CPU:

    python scripts/weights_day.py --dry-run

Load semantics match the reference exactly: ``strict=False`` partial load
(torch.load(ckpt)['model_state_dict'], /root/reference/src/
inference_v2a.py:117-124) — frozen-encoder keys embedded in the .pt
(text_encoder2.*, image_encoder.*, vocos.*) are reported, not fatal.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run(stage: str, cmd: list, summary: dict, timeout: int = 3600) -> bool:
    print(f"==> {stage}: {' '.join(cmd)}", flush=True)
    try:
        proc = subprocess.run(cmd, timeout=timeout, text=True,
                              capture_output=True)
        ok = proc.returncode == 0
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-6:]
        summary[stage] = {"ok": ok, "tail": tail}
        if not ok:
            print(f"FAILED ({stage}):\n" + "\n".join(tail), flush=True)
        return ok
    except Exception as exc:
        summary[stage] = {"ok": False, "error": f"{type(exc).__name__}: {exc}"}
        return False


def dry_run(workdir: str) -> int:
    """Tiny-scale rehearsal of the full chain over all 4 reference variants."""
    from v2ap_tpu.utils.jitting import force_cpu_if_requested
    force_cpu_if_requested()
    import jax
    import jax.numpy as jnp
    import torch
    from flax import nnx
    from v2ap_tpu import config as cfglib
    from v2ap_tpu.config import SamplerConfig
    from v2ap_tpu.models.cfm import CFM
    from v2ap_tpu.utils.checkpoint import load_model, save_model
    from v2ap_tpu.utils.jitting import create_model, enable_compile_cache
    from v2ap_tpu.utils.reference_ckpt import load_reference_checkpoint
    from v2ap_tpu.utils.reference_manifest import (
        ALL_VARIANTS, audit_state_dict, synthetic_state_dict)

    enable_compile_cache()
    summary: dict = {}
    cfg = cfglib.tiny_test()
    mc = cfg.model
    b, n = 1, 32
    rng = np.random.default_rng(0)

    def make_forward(mc):
        # inputs fixed ONCE: every forward() call must see identical data
        # (the checks below compare outputs across independent loads)
        x0 = jnp.asarray(rng.normal(size=(b, n, mc.num_channels))
                         .astype(np.float32))
        text = jnp.asarray(rng.normal(size=(b, n, mc.dim_text))
                           .astype(np.float32))
        frames = jnp.zeros((b, n, mc.notes), jnp.float32)
        ctx = jnp.zeros((b, 1, mc.dim_context), jnp.float32)

        def forward(model):
            out = model.sample(
                x0, text_embed=text, frames_embed=frames, context=ctx,
                context_mask=jnp.ones((b, 1), bool), mask=None,
                sampler=SamplerConfig(steps=2, cfg_strength=1.0))
            return np.asarray(out)

        return forward

    ok_all = True
    cfm_dir = None
    import dataclasses
    for variant in ALL_VARIANTS:
        # the 88-key variant (reference e2_tts_crossatt3_2.py:74-76)
        vmc = (dataclasses.replace(mc, notes=88, note_min=0, note_max=87)
               if variant == "crossatt3_2" else mc)
        forward = make_forward(vmc)
        # models built exactly as convert_checkpoints.py builds them
        # (with_video2roll=True; a crossatt/crossatt6 sd leaves the inert
        # frames stream + Video2Roll random, like the reference's
        # strict=False partial load does)
        build = lambda s, m=vmc: create_model(
            lambda: CFM(m, cfg.conditioning, rngs=nnx.Rngs(s)))

        # 1. synthesize the reference layout and save a REAL .pt so the
        # torch.load -> model_state_dict -> strict=False path is the one
        # exercised (inference_v2a.py:117-124 semantics)
        sd = synthetic_state_dict(vmc, variant)
        pt = os.path.join(workdir, f"{variant}.pt")
        torch.save({"model_state_dict":
                    {k: torch.from_numpy(np.asarray(v))
                     for k, v in sd.items()}}, pt)

        # 2. convert + 3. audit
        model = build(0)
        leftovers = load_reference_checkpoint(pt, model)
        report = audit_state_dict(sd, model)
        ok = not report["unexpected_unconsumed"]

        # 4. forward smoke: finite output, and a second independent load
        # produces the bit-identical one (conversion is deterministic; the
        # unconverted frames stream in two-stream variants is provably
        # inert — tests/test_reference_ckpt.py pins the zeroed fusions)
        out1 = forward(model)
        model2 = build(1)
        load_reference_checkpoint(pt, model2)
        out2 = forward(model2)
        ok = ok and bool(np.isfinite(out1).all()
                         and np.array_equal(out1, out2))

        # 5. orbax save -> reload round trip (what serving load_weights eats)
        cfm_dir = os.path.join(workdir, f"ckpt_{variant}", "cfm")
        save_model(cfm_dir, model)
        model3 = build(2)
        load_model(cfm_dir, model3)
        ok = ok and bool(np.array_equal(out1, forward(model3)))

        summary[f"convert_{variant}"] = {
            "ok": bool(ok), "leftovers": len(leftovers),
            "aux_unconsumed": report["aux_unconsumed"],
            "unexpected": report["unexpected_unconsumed"][:5]}
        ok_all = ok_all and ok
        print(f"==> convert+audit+forward+roundtrip {variant}: "
              f"{'ok' if ok else 'FAILED'}", flush=True)

    # 6. int8 end-audio gate rehearsal (tiny stack, verdict not persisted)
    video = os.path.join(workdir, "clip.mp4")
    from bench import _write_video
    have_video = _write_video(video, seconds=2.0, fps=8, size=(64, 48))
    if have_video:
        ok_all &= _run("int8_gate", [
            sys.executable, os.path.join(REPO, "scripts",
                                         "int8_tower_gate.py"),
            "--tiny", "--dry", "--videos", video, "--steps", "2"], summary)
    else:
        summary["int8_gate"] = {"ok": True, "skipped": "no cv2 writer"}

    # 7. reflow distillation rehearsal on the converted SHIPPED variant
    # (crossatt3 — distill_reflow --tiny builds the same tiny_test config)
    ok_all &= _run("distill", [
        sys.executable, os.path.join(REPO, "scripts", "distill_reflow.py"),
        "--tiny", "--ckpt", os.path.join(workdir, "ckpt_crossatt3", "cfm"),
        "--out", os.path.join(workdir, "cfm_reflow"),
        "--steps", "3", "--batch", "2", "--frames", "32",
        "--teacher-steps", "2"], summary)

    summary["bench"] = {"ok": True,
                        "note": "not run in dry mode; weights day runs: "
                                "python bench.py"}
    print(json.dumps({"dry_run_ok": ok_all, "stages": summary}), flush=True)
    return 0 if ok_all else 1


def real_run(args) -> int:
    summary: dict = {}
    conv = os.path.join(REPO, "scripts", "convert_checkpoints.py")

    # 1. audit first: a surprise key inventory should stop the day early
    if args.ckpt and not _run("audit", [
            sys.executable, conv, "--audit", "--cfm-ckpt", args.ckpt,
            "--notes", str(args.notes)], summary):
        print(json.dumps(summary))
        return 1

    # 2. convert everything provided
    cmd = [sys.executable, conv, "--out", args.out,
           "--notes", str(args.notes)]
    for flag in ("ckpt", "encodec", "t5", "clip", "dinov2", "convnext",
                 "pann", "audioldm"):
        val = getattr(args, flag)
        if val:
            cmd += [f"--{'cfm-ckpt' if flag == 'ckpt' else flag}", val]
    if not _run("convert", cmd, summary):
        print(json.dumps(summary))
        return 1

    # 3. forward smoke through the serving pipeline (full-size load +
    # one short generation; PARITY.md documents the numeric gates)
    smoke = (
        "import numpy as np;"
        "from v2ap_tpu.config import V2APConfig;"
        "from v2ap_tpu.pipelines.generate import V2APipeline;"
        "p=V2APipeline(V2APConfig());"
        f"missing=p.load_weights({args.out!r});"
        "print('missing subtrees:', missing);"
        f"wav,sr=p.generate(None, 'the sound of rain', duration_s=2.0,"
        "steps=4);"
        "assert np.isfinite(wav).all();"
        "print('smoke wav rms', float(np.sqrt(np.mean(wav**2))))")
    if not _run("forward_smoke", [sys.executable, "-c", smoke], summary):
        print(json.dumps(summary))
        return 1

    # 4. int8 end-audio gate (writes the gate file the serving default
    # consults; a failing FAD bound flips int8 towers off automatically)
    if args.videos:
        _run("int8_gate", [
            sys.executable, os.path.join(REPO, "scripts",
                                         "int8_tower_gate.py"),
            "--ckpt", args.out, "--videos", args.videos,
            "--steps", str(args.steps)], summary)

    # 5. reflow distill the serving few-step student
    if args.distill_steps > 0:
        _run("distill", [
            sys.executable, os.path.join(REPO, "scripts",
                                         "distill_reflow.py"),
            "--ckpt", os.path.join(args.out, "cfm"),
            "--out", os.path.join(args.out, "cfm_reflow"),
            "--steps", str(args.distill_steps)], summary)

    # 6. bench with real weights
    if args.bench:
        _run("bench", [sys.executable, os.path.join(REPO, "bench.py")],
             summary)
    ok = all(s.get("ok") for s in summary.values())
    print(json.dumps({"weights_day_ok": ok, "stages": summary}))
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true",
                    help="rehearse the whole chain on synthetic state dicts "
                         "of all 4 reference variants (tiny scale, CPU)")
    ap.add_argument("--workdir", default=None,
                    help="dry-run scratch dir (default: temp)")
    ap.add_argument("--ckpt", default=None, help="reference .pt")
    ap.add_argument("--out", default="ckpts/v2ap")
    ap.add_argument("--notes", type=int, default=51)
    ap.add_argument("--encodec", default=None)
    ap.add_argument("--t5", default=None)
    ap.add_argument("--clip", default=None)
    ap.add_argument("--dinov2", default=None)
    ap.add_argument("--convnext", default=None)
    ap.add_argument("--pann", default=None)
    ap.add_argument("--audioldm", default=None)
    ap.add_argument("--videos", default=None,
                    help="gate clips (dir/glob) for int8_tower_gate")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--distill-steps", type=int, default=0,
                    help="reflow-distill steps (0 = skip)")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    if args.dry_run:
        workdir = args.workdir or tempfile.mkdtemp(prefix="v2ap_weights_day_")
        return dry_run(workdir)
    if not (args.ckpt or args.encodec or args.t5 or args.clip):
        ap.error("nothing to convert (or use --dry-run)")
    return real_run(args)


if __name__ == "__main__":
    raise SystemExit(main())

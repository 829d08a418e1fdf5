"""Composite serving-default conditioning drift, in one number.

The serving defaults stack five quality-affecting levers, each bounded ALONE
in earlier rounds: int8 towers (2.95% feat rel-rms, probe_tower_drift),
frame_stride 3 (0.93%, probe_subsample_drift), yuv420 shipping (0.79%,
probe_yuv_drift), bf16 compute/params (1.39%), strip_stride 2
(probe_strip_stride). This probe measures the FULL default stack against
full reference-parity numerics — f32 towers + f32 CFM, every frame encoded
(stride 1), exact full-rate strips, RGB pixel shipping — so the composite is
a measured number, not a sum of independent bounds (VERDICT r4 weak #4).

Acceptance rule (pre-registered): the composite must stay below ~2x the
worst single bound (2 * 2.95% ~= 5.9%); above that, a default gets demoted.

Three subprocess phases (default / parity_feats / parity_roll): the f32 bigG
tower is ~7 GB and the f32 CFM ~3.1 GB, so no two of {bf16 default stack,
f32 tower, f32 CFM} fit a 16 GB chip together.

Prints ONE JSON line:
  {"serving_default_feat_drift_rel_rms": ..,       # CLIP conditioning
   "serving_default_roll_drift_rel_rms": ..,       # piano-roll conditioning
   "serving_default_modes": {...}}                 # what the defaults were
bench.py merges these keys into the driver artifact; run standalone with
  python scripts/probe_composite_drift.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write_smooth_video(path: str, seconds: float = 6.0, fps: int = 24,
                        size=(640, 360)) -> bool:
    """Smooth video-like clip: translating low-pass-filtered base — the same
    content class every single-lever drift bound was measured on
    (probe_subsample_drift / probe_yuv_drift). The bench serving clip rolls
    per-pixel iid noise (fine for timing, where content is irrelevant), but
    noise is the adversarial case no codec ships: measured on it, this
    probe's feat drift reads 14.3% — a content artifact, not the stack's
    behavior on real video (see NOTES r5)."""
    try:
        import cv2
    except ImportError:
        return False
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    if not w.isOpened():
        return False
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (size[1], 2 * size[0], 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (0, 0), 4.0)
    for i in range(int(seconds * fps)):
        frame = np.clip(np.roll(base, 2 * i, axis=1)[:, : size[0]], 0, 255)
        w.write(frame.astype(np.uint8))
    w.release()
    return os.path.getsize(path) > 0


def rel_rms(ref: np.ndarray, x: np.ndarray) -> float:
    denom = float(np.sqrt(np.mean(ref.astype(np.float64) ** 2))) or 1.0
    return float(np.sqrt(np.mean((ref.astype(np.float64)
                                  - x.astype(np.float64)) ** 2))) / denom


def default_roll(pipe, video: str, n: int) -> np.ndarray:
    """The piano-roll conditioning exactly as cold serving computes it:
    fused strided decode -> (lerp plan | exact strips) -> Video2Roll."""
    from v2ap_tpu.data import video_io

    cond = pipe.cfg.conditioning
    rgb, strips_src, dur, n_src = video_io.read_video_frames_and_strips(
        video, step=pipe._frame_stride, width=cond.piano_frame_w,
        height=cond.piano_frame_h, strip_step=pipe._strip_stride)
    if pipe._strip_stride > 1:
        plan = pipe._strided_strip_plan(strips_src, n_src, dur, n)
        return np.asarray(pipe._roll_from_strips(plan, n))
    jnp = pipe._jnp
    idx = video_io.interp_indices_piano(
        n_src, dur, n, video_multi=pipe.cfg.model.video_multi,
        sample_rate=cond.sampling_rate, frame_size=cond.frame_size)
    return np.asarray(pipe._encode_frames(
        pipe.cfm, jnp.asarray(strips_src[idx][None]), n))


def parity_feats(pipe, video: str, n: int) -> np.ndarray:
    """Reference-parity CLIP conditioning: every decoded frame through the
    f32 tower, nearest-frame interpolation to the latent rate
    (e2_tts_crossatt3.py:1800-1813). Chunks are dispatched SERIALLY with a
    host fetch between them — the pipeline's async dispatch keeps several
    f32 bigG activation peaks in flight at once, which does not fit a 16 GB
    chip next to the 7 GB f32 params (measured: RESOURCE_EXHAUSTED)."""
    import jax.numpy as jnp
    from v2ap_tpu.data import video_io

    frames, duration = video_io.read_video_frames(video)
    tower = pipe.towers[0]
    px = tower.preprocess(frames)
    mean = jnp.asarray(tower.mean, jnp.float32)
    std = jnp.asarray(tower.std, jnp.float32)
    chunk = 32
    outs = []
    for i in range(0, len(px), chunk):
        part = px[i: i + chunk]
        real = len(part)
        if real < chunk:                       # stable shapes for the jit
            part = np.concatenate(
                [part, np.repeat(part[-1:], chunk - real, axis=0)])
        out = np.asarray(pipe._tower_fwd(tower.model, jnp.asarray(part),
                                         mean, std))
        outs.append(out[:real])
    feats = np.concatenate(outs)
    idx = video_io.interp_indices_clip(
        len(feats), duration, n,
        sample_rate=pipe.cfg.conditioning.sampling_rate,
        frame_size=pipe.cfg.conditioning.frame_size)
    return feats[idx]


def parity_roll(pipe, video: str, n: int) -> np.ndarray:
    """Reference-parity roll: full-rate strips, exact nearest-index
    selection (e2_tts_crossatt3.py:1931-1942 resample math), f32 net."""
    from v2ap_tpu.data import video_io

    cond = pipe.cfg.conditioning
    _, strips_src, dur, n_src = video_io.read_video_frames_and_strips(
        video, step=1, width=cond.piano_frame_w,
        height=cond.piano_frame_h, strip_step=1)
    idx = video_io.interp_indices_piano(
        n_src, dur, n, video_multi=pipe.cfg.model.video_multi,
        sample_rate=cond.sampling_rate, frame_size=cond.frame_size)
    return np.asarray(pipe._encode_frames(
        pipe.cfm, pipe._jnp.asarray(strips_src[idx][None]), n))


def run_phase(phase: str, video: str, n: int, out_npz: str) -> None:
    """One pipeline build + conditioning pass; features land in ``out_npz``.
    Runs in its OWN process: the default (bf16+int8) and parity (f32) towers
    do not fit the 16 GB chip simultaneously, and in-process del/gc after
    phase A proved insufficient (jit executable caches pin buffers).

    The parity pass is itself TWO phases: the f32 bigG params (~7 GB) next
    to the f32 full-size CFM (~3.1 GB) + codec + activations blew HBM in one
    process (measured RESOURCE_EXHAUSTED mid-chunk). Feats parity never
    touches the CFM and roll parity never touches the tower, so each phase
    carries a tiny stand-in for the half it does not measure."""
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    from v2ap_tpu.config import V2APConfig, tiny_test
    from v2ap_tpu.models.t5 import t5_tiny_test
    from v2ap_tpu.pipelines.generate import V2APipeline

    cfg = V2APConfig()
    cfg = cfg.replace(conditioning=dataclasses.replace(
        cfg.conditioning, feature_cache=False))
    # T5 plays no part in the measured drift (prompt path untouched by any
    # serving default) — a tiny stand-in frees ~3 GB so the f32 bigG phase
    # fits the 16 GB chip
    t5 = t5_tiny_test()
    if phase == "default":
        # the shipped defaults, exactly as a fresh pipeline gets them
        # (int8 gate, stride/strip defaults, yuv auto-detection)
        pipe = V2APipeline(cfg, seed=0, t5_config=t5)
        feats, _ = pipe.encode_video_frames_clip(video, n)
        roll = default_roll(pipe, video, n)
        np.savez(out_npz, feats=np.asarray(feats), roll=np.asarray(roll),
                 modes=json.dumps({
                     "tower": pipe._tower_tag,
                     "frame_stride": pipe._frame_stride,
                     "strip_stride": pipe._strip_stride,
                     "yuv420": bool(pipe._ship_yuv420),
                     "dtype": pipe.cfg.model.dtype}))
        return

    # full reference parity: f32 end to end, no shortcuts
    for k, v in (("V2AP_INT8_TOWERS", "0"), ("V2AP_FRAME_STRIDE", "1"),
                 ("V2AP_STRIP_STRIDE", "1"), ("V2AP_SHIP_YUV420", "0"),
                 ("V2AP_SHIP_STRIP_HALF", "0")):
        os.environ[k] = v
    if phase == "parity_feats":
        from v2ap_tpu.models.clip_vit import clip_vit_bigg
        # tiny CFM stand-in: the tower pass never reads cfg.model
        cfg = cfg.replace(model=dataclasses.replace(
            tiny_test().model, video2roll=False, dtype="float32"))
        pipe = V2APipeline(
            cfg, seed=0, quantize_towers=False, t5_config=t5,
            tower_configs={"clip_vit": dataclasses.replace(
                clip_vit_bigg(), dtype="float32")})
        assert pipe._frame_stride == 1
        np.savez(out_npz, feats=np.asarray(parity_feats(pipe, video, n)))
    elif phase == "parity_roll":
        from v2ap_tpu.models.clip_vit import clip_tiny_test
        # tiny tower stand-in: the roll pass never reads the vision tower
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, dtype="float32"))
        pipe = V2APipeline(
            cfg, seed=0, quantize_towers=False, t5_config=t5,
            tower_configs={"clip_vit": clip_tiny_test()})
        assert pipe._strip_stride == 1
        np.savez(out_npz, roll=np.asarray(parity_roll(pipe, video, n)))
    else:
        raise SystemExit(f"unknown phase {phase!r}")


def main() -> None:
    import subprocess

    if "--phase" in sys.argv:          # child invocation
        i = sys.argv.index("--phase")
        run_phase(sys.argv[i + 1], sys.argv[i + 2], int(sys.argv[i + 3]),
                  sys.argv[i + 4])
        return

    video = os.path.join(tempfile.gettempdir(), "v2ap_composite_smooth.mp4")
    if not os.path.exists(video) and not _write_smooth_video(video,
                                                            seconds=6.0):
        print(json.dumps({"composite_drift_error": "no video writer"}))
        return
    n = 448                               # ~6 s of 75 Hz latent frames

    outs = {}
    for phase in ("default", "parity_feats", "parity_roll"):
        out_npz = os.path.join(tempfile.gettempdir(),
                               f"v2ap_composite_{phase}.npz")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase,
             video, str(n), out_npz],
            capture_output=True, text=True,
            timeout=int(os.environ.get("V2AP_COMPOSITE_PHASE_TIMEOUT",
                                       "900")))
        if proc.returncode != 0:
            print(json.dumps({"composite_drift_error": f"{phase}: "
                              + proc.stderr.strip().splitlines()[-1][:150]}))
            return
        outs[phase] = np.load(out_npz, allow_pickle=False)

    out = {
        "serving_default_feat_drift_rel_rms": round(rel_rms(
            outs["parity_feats"]["feats"], outs["default"]["feats"]), 4),
        "serving_default_roll_drift_rel_rms": round(rel_rms(
            outs["parity_roll"]["roll"], outs["default"]["roll"]), 4),
        "serving_default_modes": json.loads(
            str(outs["default"]["modes"])),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

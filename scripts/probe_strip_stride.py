"""Probe the strided keyboard-strip mode (V2AP_STRIP_STRIDE):

1. quality — Video2Roll output drift (rel-rms on sigmoid probabilities)
   between exact full-rate strips and strided strips + device lerp
   (interp_weights_piano plan), on smooth keyboard-like content AND the
   worst-case noise clip, for strides 2/3/4;
2. speed — interleaved cold V2P walls, strided vs exact, on the real chip.

Methodology matches the accepted levers (probe_subsample_drift /
probe_strip_half): drift must sit at or below the bf16 compute dtype's
~1.4% rel-rms before a stride can be the tunneled-host default. Unlike the
strip-half pack (a host-side cost ADDED to the critical path, net loss),
striding REMOVES decode work: the fused reader grab()-skips the frames
between anchors.

Run alone: python scripts/probe_strip_stride.py [--timing]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def drift_probe() -> None:
    import jax.numpy as jnp
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.data.video_io import interp_indices_piano, interp_weights_piano
    from v2ap_tpu.pipelines.generate import V2APipeline

    cfg = V2APConfig()
    pipe = V2APipeline(cfg, seed=0)
    rng = np.random.default_rng(0)
    # a "source video" at 30 fps for 4 s; the roll asks for n rows over it
    t_src, fps = 120, 30.0
    h, w = cfg.conditioning.piano_frame_h, cfg.conditioning.piano_frame_w
    dur = t_src / fps
    n = 288   # latent frames over ~3.84 s

    x = np.linspace(0, 8 * np.pi, w)
    smooth = np.zeros((t_src, h, w), np.float32)
    for i in range(t_src):
        keys = (np.sin(x + 0.1 * i) > 0.7).astype(np.float32)
        smooth[i] = 0.35 + 0.4 * keys[None, :] + 0.1 * np.sin(
            np.linspace(0, np.pi, h))[:, None]
    clips = {
        "smooth": np.clip(smooth * 255, 0, 255).astype(np.uint8),
        "noise": rng.integers(0, 256, (t_src, h, w), dtype=np.uint8),
    }
    kw = dict(video_multi=cfg.model.video_multi,
              sample_rate=cfg.conditioning.sampling_rate,
              frame_size=cfg.conditioning.frame_size)
    for name, strips in clips.items():
        idx = interp_indices_piano(t_src, dur, n, **kw)
        exact = np.asarray(pipe._encode_frames(
            pipe.cfm, jnp.asarray(strips[idx][None]), n))
        denom = float(np.sqrt(np.mean(exact ** 2))) or 1.0
        for ss in (2, 3, 4):
            i0, i1, wgt = interp_weights_piano(t_src, dur, n, ss, **kw)
            lerped = np.asarray(pipe._encode_frames_strided(
                pipe.cfm, jnp.asarray(strips[::ss][None]),
                jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(wgt), n))
            rel = float(np.sqrt(np.mean((exact - lerped) ** 2))) / denom
            # input-side strip reconstruction error (content-level bound)
            sel = (strips[::ss][i0].astype(np.float32)
                   * (1 - wgt)[:, None, None]
                   + strips[::ss][i1].astype(np.float32)
                   * wgt[:, None, None])
            ref = strips[idx].astype(np.float32)
            in_rel = (float(np.sqrt(np.mean((ref - sel) ** 2)))
                      / (float(np.sqrt(np.mean(ref ** 2))) or 1.0))
            print(f"{name} stride{ss}: roll-prob drift {rel:.4%} rel-rms, "
                  f"strip reconstruction {in_rel:.4%} rel-rms", flush=True)


def timing_probe() -> None:
    import dataclasses

    from bench import _write_video
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.pipelines.generate import V2APipeline

    video = os.path.join(tempfile.gettempdir(), "v2ap_bench_clip.mp4")
    if not os.path.exists(video) and not _write_video(video):
        print("no video writer")
        return
    cfg = V2APConfig()
    cfg = cfg.replace(conditioning=dataclasses.replace(
        cfg.conditioning, feature_cache=False))
    pipe = V2APipeline(cfg, seed=0)

    def run(ss, seed):
        pipe._strip_stride = ss
        t0 = time.perf_counter()
        wav, sr = pipe.generate(video, prompt="", steps=25,
                                piano=True, seed=seed)
        wall = time.perf_counter() - t0
        return len(wav) / sr / wall, dict(pipe.last_timings)

    variants = [1, int(os.environ.get("PROBE_STRIP_STRIDE", "2"))]
    for ss in variants:
        run(ss, 0)                        # warm both jit paths
    acc = {ss: [] for ss in variants}
    for rep in range(int(os.environ.get("PROBE_REPS", "4"))):
        order = variants if rep % 2 == 0 else variants[::-1]
        for ss in order:
            rtf, t = run(ss, rep + 1)
            acc[ss].append(rtf)
            print(f"rep{rep} ss{ss} rtf={rtf:.3f} "
                  f"decode={t.get('decode_s', 0):.3f} "
                  f"video_encode={t.get('video_encode_s', 0):.3f} "
                  f"sample={t.get('sample_decode_s', 0):.3f}", flush=True)
    for ss, v in acc.items():
        print(f"ss{ss}: median {np.median(v):.3f} min {min(v):.3f} "
              f"max {max(v):.3f} n={len(v)}")


if __name__ == "__main__":
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    if "--timing" in sys.argv:
        timing_probe()
    else:
        drift_probe()

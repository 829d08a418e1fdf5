"""Probe the 2:1 keyboard-strip shipping mode (V2AP_SHIP_STRIP_HALF):

1. quality — Video2Roll output drift (rel-rms on sigmoid probabilities and
   on pre-sigmoid logits) between exact strips and pack->upsample strips,
   on smooth video-like content AND on the worst-case noise clip;
2. speed — interleaved cold V2P walls, packed vs exact, on the real chip.

Methodology matches the accepted levers (probe_yuv_drift / probe_subsample
/ probe_tower_drift): drift must sit at or below the bf16 compute dtype's
~1.4% rel-rms before the mode can become a tunneled-host default.

Run alone: python scripts/probe_strip_half.py [--timing]
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
    from v2ap_tpu.data.video_io import pack_strips_half
    from v2ap_tpu.models.video2roll import upsample_strips_2x
    from v2ap_tpu.pipelines.generate import V2APipeline

    cfg = V2APConfig()
    pipe = V2APipeline(cfg, seed=0)
    rng = np.random.default_rng(0)
    t, h, w = 24, cfg.conditioning.piano_frame_h, cfg.conditioning.piano_frame_w
    n = t * int(cfg.model.video_multi)

    # smooth "keyboard-like" content: slow horizontal gradients + moving
    # bright key regions; and the adversarial full-noise case
    x = np.linspace(0, 8 * np.pi, w)
    smooth = np.zeros((t, h, w), np.float32)
    for i in range(t):
        keys = (np.sin(x + 0.3 * i) > 0.7).astype(np.float32)
        smooth[i] = 0.35 + 0.4 * keys[None, :] + 0.1 * np.sin(
            np.linspace(0, np.pi, h))[:, None]
    clips = {
        "smooth": np.clip(smooth * 255, 0, 255).astype(np.uint8),
        "noise": rng.integers(0, 256, (t, h, w), dtype=np.uint8),
    }
    for name, strips in clips.items():
        exact = np.asarray(pipe._encode_frames(
            pipe.cfm, jnp.asarray(strips[None]), n))
        packed = np.asarray(pipe._encode_frames_half(
            pipe.cfm, jnp.asarray(pack_strips_half(strips)[None]), n))
        denom = float(np.sqrt(np.mean(exact ** 2))) or 1.0
        rel = float(np.sqrt(np.mean((exact - packed) ** 2))) / denom
        # input-side reconstruction error too (content-level bound)
        up = np.asarray(upsample_strips_2x(
            jnp.asarray(pack_strips_half(strips), jnp.float32)))
        in_rel = float(np.sqrt(np.mean((strips.astype(np.float32) - up) ** 2))
                       ) / (float(np.sqrt(np.mean(
                           strips.astype(np.float32) ** 2))) or 1.0)
        print(f"{name}: roll-prob drift {rel:.4%} rel-rms, "
              f"strip reconstruction {in_rel:.4%} rel-rms", flush=True)


def timing_probe() -> None:
    from bench import _write_video
    from v2ap_tpu.config import V2APConfig
    import dataclasses

    video = os.path.join(tempfile.gettempdir(), "v2ap_bench_clip.mp4")
    if not os.path.exists(video) and not _write_video(video):
        print("no video writer")
        return

    from v2ap_tpu.pipelines.generate import V2APipeline
    cfg = V2APConfig()
    cfg = cfg.replace(conditioning=dataclasses.replace(
        cfg.conditioning, feature_cache=False))
    pipe = V2APipeline(cfg, seed=0)

    def run(name, seed):
        # one pipeline, flag flipped in place (feature_cache is off, so the
        # roll-tag divergence is irrelevant; both jits exist on the instance)
        pipe._ship_strip_half = name == "half"
        t0 = time.perf_counter()
        wav, sr = pipe.generate(video, prompt="", steps=25,
                                piano=True, seed=seed)
        return len(wav) / sr / (time.perf_counter() - t0)

    for name in ("exact", "half"):
        run(name, 0)                      # warm both
    acc = {"exact": [], "half": []}
    for rep in range(4):
        order = ["exact", "half"] if rep % 2 == 0 else ["half", "exact"]
        for name in order:
            rtf = run(name, rep + 1)
            acc[name].append(rtf)
            print(f"rep{rep} {name:6s} rtf={rtf:.3f}", flush=True)
    for name, v in acc.items():
        print(f"{name}: median {np.median(v):.3f} min {min(v):.3f} "
              f"max {max(v):.3f}")


if __name__ == "__main__":
    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    if "--timing" in sys.argv:
        timing_probe()
    else:
        drift_probe()

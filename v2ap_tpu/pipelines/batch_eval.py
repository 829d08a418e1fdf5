"""Batch evaluation over scp manifests (the working version of the
reference's src/inference_v2a.py / inference_v2p.py CLIs).

Iterates manifest rows [start:end], generates audio per clip, writes wavs
(+ muxed videos when a muxer exists), and records timing. The reference's
collate-path bug (2-arg ``encode_video_frames`` call, SURVEY §1) does not
exist here — the pipeline API is the single entry for both serving and eval.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from v2ap_tpu.data.manifests import load_corpus, CorpusSpec


def run_batch_eval(
    pipeline,
    scp_path: str,
    out_dir: str,
    *,
    start: int = 0,
    end: Optional[int] = None,
    step: int = 1,
    caption_prefix: str = "",
    steps: int = 64,
    cfg_strength: float = 2.0,
    drop_prompt: bool = False,
    piano: bool = False,
    seed: int = 0,
    mux: bool = True,
    passes: int = 1,
    clap_scores: bool = False,
) -> dict:
    """Returns a summary dict: clips attempted/succeeded, realtime factor,
    and per-clip CLAP caption-audio scores when ``clap_scores`` and a scorer
    is registered (data.clap_filter)."""
    from v2ap_tpu.data.audio_io import write_wav
    from v2ap_tpu.data.video_io import mux_audio_onto_video

    # manifest slicing [start:end:step] and the "the sound of " caption
    # prefix match the reference's vgg_test eval path
    # (trainer_multigpus_alldatas3.py:936-950)
    samples = load_corpus(CorpusSpec("eval", scp_path, is_video=True,
                                     is_piano=piano))
    samples = samples[start:end:max(1, step)]
    os.makedirs(out_dir, exist_ok=True)

    done, failed = 0, 0
    audio_s, wall_s = 0.0, 0.0
    clap_rows: list = []
    for i, sample in enumerate(samples):
        prompt = "" if drop_prompt else (
            caption_prefix + (sample.caption or ""))
        t0 = time.perf_counter()
        try:
            wav, sr = pipeline.generate(
                sample.path, prompt, steps=steps, cfg_strength=cfg_strength,
                piano=piano, seed=seed + i, passes=passes)
        except Exception as exc:  # bad clip: record and continue (SURVEY §5.3)
            failed += 1
            print(f"[batch_eval] FAILED {sample.path}: {exc}")
            continue
        wall_s += time.perf_counter() - t0
        audio_s += len(wav) / sr
        stem = os.path.splitext(os.path.basename(sample.path))[0]
        wav_path = os.path.join(out_dir, f"{stem}.wav")
        write_wav(wav_path, wav, sr)
        if mux:
            mux_audio_onto_video(sample.path, wav, sr,
                                 os.path.join(out_dir, f"{stem}.mp4"))
        if clap_scores:
            from v2ap_tpu.data import clap_filter
            s = clap_filter.score(wav[None], sr, sample.caption or "")
            if s is not None:
                clap_rows.append({"clip": stem, "clap": round(s, 4)})
        done += 1

    summary = {
        "clips": len(samples), "succeeded": done, "failed": failed,
        "audio_seconds": round(audio_s, 2), "wall_seconds": round(wall_s, 2),
        "realtime_factor": round(audio_s / wall_s, 3) if wall_s else None,
    }
    if clap_scores and clap_rows:
        summary["clap_mean"] = round(
            sum(r["clap"] for r in clap_rows) / len(clap_rows), 4)
        summary["clap_scores"] = clap_rows
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary

#!/usr/bin/env python
"""Merge chunked generation outputs and mux them back onto videos.

The reference's ``src/merge_wavs.py`` does this with hardcoded paths, shell
``sox a.wav b.wav out.wav`` concatenation (no crossfade) and moviepy muxing
(reference merge_wavs.py:30-48,82-111). This is the same surface as a real
CLI over the framework's merge/mux primitives:

    # group consecutive 10 s chunk wavs (<stem>.00000000.wav ...) N at a time
    python scripts/merge_wavs.py concat --in-dir outs/ --out-dir outs_20s/ \
        --group 2 [--overlap-ms 0]

    # mux each <stem>.wav onto the matching <stem>.mp4
    python scripts/merge_wavs.py mux --wav-dir outs/ --video-dir vids/ \
        --out-dir muxed/

``--overlap-ms 0`` reproduces the reference's plain concatenation;
a positive value applies the framework's equal-power crossfade
(pipelines/merge.merge_wav_files) at the joins.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHUNK_RE = re.compile(r"^(?P<stem>.+)\.(?P<idx>\d{8})\.wav$")


def collect_chunks(in_dir: str) -> dict:
    """{stem: [path sorted by chunk index]} over ``<stem>.%08d.wav`` files
    (the reference's chunked-output naming, tests/piano_2h_test.scp)."""
    groups: dict = {}
    for p in sorted(glob.glob(os.path.join(in_dir, "*.wav"))):
        m = _CHUNK_RE.match(os.path.basename(p))
        if m:
            groups.setdefault(m.group("stem"), []).append(
                (int(m.group("idx")), p))
    return {s: [p for _, p in sorted(v)] for s, v in groups.items()}


def cmd_concat(args) -> int:
    from v2ap_tpu.pipelines.merge import merge_wav_files

    os.makedirs(args.out_dir, exist_ok=True)
    groups = collect_chunks(args.in_dir)
    written = 0
    for stem, paths in groups.items():
        for i in range(0, len(paths), args.group):
            out = os.path.join(args.out_dir,
                               f"{stem}.{i // args.group + 1}.wav")
            merge_wav_files(paths[i: i + args.group], out,
                            crossfade_s=args.overlap_ms / 1000.0)
            written += 1
    print(f"wrote {written} merged wavs from {len(groups)} stems")
    return 0 if written else 1


def cmd_mux(args) -> int:
    from v2ap_tpu.data.audio_io import read_wav
    from v2ap_tpu.data.video_io import mux_audio_onto_video

    os.makedirs(args.out_dir, exist_ok=True)
    done = failed = 0
    for wav_path in sorted(glob.glob(os.path.join(args.wav_dir, "*.wav"))):
        stem = os.path.splitext(os.path.basename(wav_path))[0]
        video = os.path.join(args.video_dir, stem + ".mp4")
        if not os.path.exists(video):
            continue
        wav, sr = read_wav(wav_path)
        wav = wav[0] if wav.ndim == 2 else wav
        out = os.path.join(args.out_dir, stem + ".mp4")
        try:
            mux_audio_onto_video(video, wav, sr, out)
            done += 1
        except (RuntimeError, OSError) as exc:
            print(f"mux failed for {stem}: {exc}", file=sys.stderr)
            failed += 1
    print(f"muxed {done} videos ({failed} failed)")
    return 1 if failed or not done else 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("concat", help="group chunk wavs into longer files")
    c.add_argument("--in-dir", required=True)
    c.add_argument("--out-dir", required=True)
    c.add_argument("--group", type=int, default=2,
                   help="chunks per output (reference pairs 10 s -> 20 s)")
    c.add_argument("--overlap-ms", type=float, default=0.0,
                   help="crossfade at joins; 0 = plain concat like sox")
    c.set_defaults(fn=cmd_concat)
    m = sub.add_parser("mux", help="mux <stem>.wav onto <stem>.mp4")
    m.add_argument("--wav-dir", required=True)
    m.add_argument("--video-dir", required=True)
    m.add_argument("--out-dir", required=True)
    m.set_defaults(fn=cmd_mux)
    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

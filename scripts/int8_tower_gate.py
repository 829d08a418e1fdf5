"""CLI for the int8-tower end-audio quality gate (evaluation/int8_gate.py).

Ready to run the moment real converted weights exist:

    python scripts/int8_tower_gate.py --ckpt ckpts/converted \\
        --videos tests/VGGSound/video --steps 25 --bound-fad 1.0

Generates every clip twice (bf16 towers vs int8 towers, same seed), scores
FAD(int8 | bf16) on Cnn14 embeddings (+ mean CLAP delta when --prompts is
given), and writes the verdict to the gate file V2APipeline consults — a
failing bound flips the int8 serving default off automatically.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="converted checkpoint dir (load_weights layout)")
    ap.add_argument("--videos", required=True,
                    help="video file, directory, or glob")
    ap.add_argument("--prompts", default=None,
                    help="optional text file, one prompt per clip")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bound-fad", type=float, default=1.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny test stack (no real weights; plumbing check)")
    ap.add_argument("--dry", action="store_true",
                    help="print the verdict without writing the gate file")
    args = ap.parse_args()

    from v2ap_tpu.utils.jitting import enable_compile_cache, \
        force_cpu_if_requested
    force_cpu_if_requested()
    enable_compile_cache()

    if os.path.isdir(args.videos):
        videos = sorted(glob.glob(os.path.join(args.videos, "*.mp4")))
    else:
        videos = sorted(glob.glob(args.videos)) or [args.videos]
    videos = [v for v in videos if os.path.getsize(v) > 1024]  # skip LFS stubs
    if not videos:
        raise SystemExit("no usable clips (LFS stubs excluded)")
    prompts = None
    if args.prompts:
        with open(args.prompts) as f:
            prompts = [line.strip() for line in f][: len(videos)]

    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.evaluation.int8_gate import run_gate
    from v2ap_tpu.pipelines.generate import V2APipeline

    if args.tiny:
        import dataclasses
        from v2ap_tpu import config as cfglib
        from v2ap_tpu.models.clip_vit import clip_tiny_test
        from v2ap_tpu.models.t5 import t5_tiny_test
        cfg = cfglib.tiny_test()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, dim_text=16, dim_context=32, num_channels=8))
        pipe = V2APipeline(cfg, t5_config=t5_tiny_test(),
                           clip_config=clip_tiny_test())
        from v2ap_tpu.evaluation.pann import make_embedder, pann_tiny_test
        embedder = make_embedder(pann_tiny_test())
    else:
        pipe = V2APipeline(V2APConfig())
        embedder = None
    if args.ckpt:
        pipe.load_weights(args.ckpt)

    verdict = run_gate(pipe, videos, prompts, steps=args.steps,
                       seed=args.seed, bound_fad=args.bound_fad,
                       embedder=embedder, write=not args.dry)
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()

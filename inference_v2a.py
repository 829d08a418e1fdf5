#!/usr/bin/env python
"""Video-to-audio batch inference CLI.

Keeps the reference's public interface (src/inference_v2a.py argv:
``ckpt drop_prompt test_scp start end out_dir``) on top of the TPU-native
pipeline, plus proper flags. Examples:

    python inference_v2a.py ckpts/model 0 tests/vgg_test.scp 0 100 outputs/
    python inference_v2a.py --ckpt ckpts/model --scp tests/vgg_test.scp \
        --start 0 --end 100 --out outputs/ --steps 64 --cfg 2.0
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    # positional reference-compatible form
    if len(argv) >= 6 and not argv[0].startswith("-"):
        ns = argparse.Namespace(
            ckpt=argv[0], drop_prompt=bool(int(argv[1])), scp=argv[2],
            start=int(argv[3]), end=int(argv[4]), out=argv[5],
            step=int(argv[6]) if len(argv) > 6 else 1,
            steps=64, cfg=2.0, piano=False, seed=0, passes=1,
            raw_captions=False)
        return ns
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--drop-prompt", dest="drop_prompt", action="store_true")
    p.add_argument("--scp", required=True, help="video_path\\tcaption manifest")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--step", type=int, default=1,
                   help="manifest stride (reference vgg_test[3])")
    p.add_argument("--raw-captions", dest="raw_captions", action="store_true",
                   help="skip the reference's 'the sound of ' caption prefix")
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--cfg", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--piano", action="store_true")
    p.add_argument("--passes", type=int, default=1,
                   help="multi-pass refinement sampling (restart passes)")
    p.add_argument("--tiny", action="store_true",
                   help="miniature debug config (random weights, CPU-friendly)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from v2ap_tpu.utils.jitting import enable_compile_cache, \
        force_cpu_if_requested
    force_cpu_if_requested()
    enable_compile_cache()
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.pipelines.generate import V2APipeline
    from v2ap_tpu.pipelines.batch_eval import run_batch_eval

    if getattr(args, "tiny", False):
        import dataclasses
        from v2ap_tpu import config as cfglib
        from v2ap_tpu.models.t5 import t5_tiny_test
        from v2ap_tpu.models.clip_vit import clip_tiny_test
        cfg = cfglib.tiny_test()
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, dim_text=16, dim_context=32, num_channels=8))
        pipeline = V2APipeline(cfg, quantize_towers=False,
                               t5_config=t5_tiny_test(),
                               clip_config=clip_tiny_test())
    else:
        # batch-eval CLI: reference-parity numerics (int8 is serving-only)
        pipeline = V2APipeline(V2APConfig(), quantize_towers=False)
    if args.ckpt:
        pipeline.load_weights(args.ckpt)

    summary = run_batch_eval(
        pipeline, args.scp, args.out, start=args.start, end=args.end,
        step=getattr(args, "step", 1),
        caption_prefix="" if getattr(args, "raw_captions", False)
        else "the sound of ",
        steps=args.steps, cfg_strength=args.cfg,
        drop_prompt=args.drop_prompt, piano=args.piano, seed=args.seed,
        passes=getattr(args, "passes", 1))
    print(summary)
    return 0 if summary["failed"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())

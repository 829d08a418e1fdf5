#!/usr/bin/env python
"""Video-to-piano batch inference CLI (piano-roll conditioned generation).

Same interface as inference_v2a.py but with the piano branch enabled
(reference: src/inference_v2p.py — byte-similar to the v2a CLI except the
piano manifest and flag; here it is one flag on the shared implementation).
"""

from __future__ import annotations

import sys

from inference_v2a import main as _main, parse_args  # noqa: F401


def main(argv=None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    if argv and not argv[0].startswith("-"):
        argv = argv + ["--piano"] if "--piano" not in argv else argv
        # positional form: route through the flag-less parser then force piano
        args = parse_args(argv[:6])
        args.piano = True
        from v2ap_tpu.utils.jitting import enable_compile_cache, \
            force_cpu_if_requested
        force_cpu_if_requested()
        enable_compile_cache()
        from v2ap_tpu.config import V2APConfig
        from v2ap_tpu.pipelines.generate import V2APipeline
        from v2ap_tpu.pipelines.batch_eval import run_batch_eval
        # batch-eval CLI: reference-parity numerics (int8 is serving-only)
        pipeline = V2APipeline(V2APConfig(), quantize_towers=False)
        if args.ckpt:
            pipeline.load_weights(args.ckpt)
        summary = run_batch_eval(
            pipeline, args.scp, args.out, start=args.start, end=args.end,
            step=getattr(args, "step", 1),
            caption_prefix="the sound of ",
            steps=args.steps, cfg_strength=args.cfg,
            drop_prompt=args.drop_prompt, piano=True, seed=args.seed)
        print(summary)
        return 0 if summary["failed"] == 0 else 1
    if "--piano" not in argv:
        argv.append("--piano")
    return _main(argv)


if __name__ == "__main__":
    raise SystemExit(main())

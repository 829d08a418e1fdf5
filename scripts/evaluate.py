#!/usr/bin/env python
"""Evaluation CLI: batch-generate over a manifest and score.

    python scripts/evaluate.py --scp tests/vgg_test.scp --out outputs/ \
        --steps 64 [--piano] [--ref-dir path/to/reference_wavs]

Reports realtime factor always; FAD when an embedder is registered and a
reference wav dir is given; roll P/R/F1 when ground-truth rolls exist
(``<video>.3.npy``).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--cfg", type=float, default=2.0)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=None)
    ap.add_argument("--piano", action="store_true")
    ap.add_argument("--passes", type=int, default=1)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--ref-dir", default=None,
                    help="reference wavs for FAD (built-in PANN embedder; "
                         "set $V2AP_PANN_WEIGHTS for absolute numbers)")
    ap.add_argument("--clap", action="store_true",
                    help="per-clip CLAP caption-audio scores (registers the "
                         "built-in scorer; set $V2AP_CLAP_WEIGHTS for real "
                         "numbers)")
    args = ap.parse_args()

    from v2ap_tpu.utils.jitting import enable_compile_cache, \
        force_cpu_if_requested
    force_cpu_if_requested()
    enable_compile_cache()

    from inference_v2a import parse_args as _  # noqa: F401 (shared config path)
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.pipelines.batch_eval import run_batch_eval
    from v2ap_tpu.pipelines.generate import V2APipeline

    if args.tiny:
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
        # quality evaluation runs reference-parity numerics, not the int8
        # serving default
        pipeline = V2APipeline(V2APConfig(), quantize_towers=False)
    if args.ckpt:
        pipeline.load_weights(args.ckpt)

    if args.clap:
        from v2ap_tpu.data import clap_filter
        if not clap_filter.has_scorer():
            from v2ap_tpu.evaluation.clap_scorer import make_clap_scorer
            clap_filter.set_scorer(make_clap_scorer())

    summary = run_batch_eval(
        pipeline, args.scp, args.out, start=args.start, end=args.end,
        steps=args.steps, cfg_strength=args.cfg, piano=args.piano,
        passes=args.passes, clap_scores=args.clap)

    # optional FAD / IS / KL against a reference corpus (self-contained
    # PANN Cnn14 embedder+classifier; KL is paired by wav basename)
    if args.ref_dir:
        from v2ap_tpu.data.audio_io import read_wav
        from v2ap_tpu.evaluation import metrics
        try:
            gen_paths = sorted(glob.glob(os.path.join(args.out, "*.wav")))
            ref_paths = sorted(glob.glob(os.path.join(args.ref_dir, "*.wav")))
            gen = [read_wav(p)[0][0] for p in gen_paths]
            ref = [read_wav(p)[0][0] for p in ref_paths]
            # one Cnn14 backbone pass per clip serves every metric: FAD/IS
            # use the FULL collections (reference stats from the whole
            # corpus), KL pairs rows by wav basename
            import numpy as np
            from v2ap_tpu.evaluation.pann import make_joint
            joint = make_joint()

            def run_all(wavs):
                outs = [joint(w, 24_000) for w in wavs]
                return (np.concatenate([np.atleast_2d(e) for e, _ in outs]),
                        np.concatenate([np.atleast_2d(l) for _, l in outs]))

            ref_emb, ref_logits = run_all(ref)
            gen_emb, gen_logits = run_all(gen)
            summary["fad"] = metrics.fad_from_embeddings(ref_emb, gen_emb)
            is_mean, is_std = metrics.inception_score(gen_logits)
            summary["is_mean"], summary["is_std"] = is_mean, is_std
            ref_idx = {os.path.basename(p): i
                       for i, p in enumerate(ref_paths)}
            pair_rows = [ref_idx.get(os.path.basename(p))
                         for p in gen_paths]
            if gen_paths and all(i is not None for i in pair_rows):
                r_log = ref_logits[np.asarray(pair_rows)]
                summary["kl_softmax"] = metrics.kl_softmax(r_log, gen_logits)
                summary["kl_sigmoid"] = metrics.kl_sigmoid(r_log, gen_logits)
        except (RuntimeError, ValueError) as exc:
            summary["fad_error"] = str(exc)

    print(json.dumps(summary))
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

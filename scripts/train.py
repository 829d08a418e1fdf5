#!/usr/bin/env python
"""Training entry point — can reproduce all four reference variants.

    # shipped V2A+V2P model (reference e2_tts_crossatt3.py)
    python scripts/train.py --corpora-root /data/scps --steps 100000

    # 88-key piano variant, preference optimization, accumulated batches
    python scripts/train.py --corpora-root /data/scps --variant crossatt3_2 \
        --dpo --grad-accum 2 --batch-size 16

    # everything from a config file (V2APConfig JSON round-trip)
    python scripts/train.py --corpora-root /data/scps --config cfg.json

Builds the corpus mix (manifests.default_corpora), the host batcher, and the
TrainingPipeline (device encoders + sharded CFM train step + resilience loop).
The reference selected variants by editing one of four ~95%-duplicated
model/trainer files (SURVEY §1); here ``--variant`` maps to config presets
over one model.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_config(args) -> "V2APConfig":
    import dataclasses as _dc

    from v2ap_tpu import config as cfgmod

    if args.config:
        with open(args.config) as f:
            cfg = cfgmod.V2APConfig.from_json(f.read())
    elif args.tiny:
        cfg = cfgmod.tiny_tower_test()
        base = cfgmod.variant_preset(args.variant)
        cfg = cfg.replace(
            model=_dc.replace(cfg.model, video2roll=base.model.video2roll),
            train=_dc.replace(cfg.train,
                              contrastive=base.train.contrastive))
    else:
        cfg = cfgmod.variant_preset(args.variant)

    model_kw = {}
    train_kw = {}
    cond_kw = {}
    if not args.no_remat and not args.tiny:
        # remat: the full-size model + f32 AdamW state needs recompute-
        # backward to fit per-chip HBM (see ModelConfig.remat). The "dots"
        # policy saves matmul outputs (~1.5 GB at 12x1024 batch 4) and only
        # recomputes elementwise ops: measured 430 -> 369 ms/step (b=4),
        # 705 -> 603 ms (b=8, 25.4% MFU) on one v5e chip.
        model_kw["remat"] = True
        model_kw["remat_policy"] = args.remat_policy
    if args.video_encoder:
        cond_kw["video_encoder"] = args.video_encoder
        if args.video_encoder == "mixed":
            model_kw["dim_text_raw"] = 4608
    if args.dpo:
        train_kw["dpo"] = True
    if args.contrastive:
        train_kw["contrastive"] = True
    if args.grad_accum is not None:
        train_kw["grad_accum"] = args.grad_accum
    if args.batch_size is not None:
        train_kw["batch_size"] = args.batch_size
    if model_kw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))
    if train_kw:
        cfg = cfg.replace(train=dataclasses.replace(cfg.train, **train_kw))
    if cond_kw:
        cfg = cfg.replace(
            conditioning=dataclasses.replace(cfg.conditioning, **cond_kw))
    return cfg


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora-root", required=True)
    ap.add_argument("--config", default=None,
                    help="V2APConfig JSON file (see V2APConfig.to_json); "
                         "CLI flags below override its values")
    ap.add_argument("--variant", default="crossatt3",
                    help="reference variant preset: crossatt (base, no "
                         "piano-roll), crossatt6 (contrastive), crossatt3 "
                         "(shipped V2A+V2P), crossatt3_2 (88-key)")
    ap.add_argument("--video-encoder", default=None,
                    choices=["clip_vit", "clip_vit2", "clip_convnext",
                             "dinov2", "mixed"])
    ap.add_argument("--dpo", action="store_true",
                    help="preference optimization: corpora marked "
                         "preference_pairs supply a*/b* winner/loser pairs")
    ap.add_argument("--contrastive", action="store_true",
                    help="FactorCL audio<->video contrastive loss")
    ap.add_argument("--grad-accum", type=int, default=None)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--eval-scp", default=None,
                    help="held-out manifest for periodic val loss/F1 + "
                         "spectrogram figures every save_step")
    ap.add_argument("--work-dir", default="runs/v2ap")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--host-id", type=int, default=None,
                    help="defaults to jax.process_index() after "
                         "init_distributed (override for manual launches)")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--remat-policy", choices=("dots", "full"),
                    default="dots",
                    help="checkpoint policy: 'dots' keeps matmul outputs "
                         "(faster), 'full' recomputes everything (min HBM)")
    ap.add_argument("--no-remat", action="store_true",
                    help="keep all activations (faster per step, needs the "
                         "HBM headroom of a sharded/multi-chip run)")
    ap.add_argument("--no-mesh", action="store_true",
                    help="skip device-mesh sharding (single-device debug)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU-runnable miniature (tiny model + tiny frozen "
                         "towers) for smoke-driving the full CLI path")
    args = ap.parse_args()

    from v2ap_tpu.utils.jitting import enable_compile_cache, \
        force_cpu_if_requested
    force_cpu_if_requested()
    enable_compile_cache()
    # multi-host: no-op single process; on pod slices jax.devices() then
    # spans all hosts and the mesh below is global
    from v2ap_tpu.parallel.distributed import host_shard_info, init_distributed
    init_distributed()
    import jax
    from v2ap_tpu.data import (CorpusSpec, TrainBatcher, default_corpora,
                               load_corpora, load_corpus)
    from v2ap_tpu.training.pipeline import TrainingPipeline

    host_id, num_hosts = host_shard_info()
    if args.host_id is not None:
        host_id = args.host_id
    if args.num_hosts is not None:
        num_hosts = args.num_hosts

    cfg = build_config(args)

    specs = default_corpora(args.corpora_root)
    if cfg.train.dpo:
        # the preference-pair corpus: a*/b* same-clip files, same convention
        # as the reference's dataset indices (trainer...3.py:1316-1328)
        specs.append(CorpusSpec("preference_pairs",
                                os.path.join(args.corpora_root, "pairs.scp"),
                                is_video=True, preference_pairs=True))
    samples = load_corpora(specs)
    if not samples:
        print(f"no samples found under {args.corpora_root}", file=sys.stderr)
        return 2
    batcher = TrainBatcher(samples, cfg.data,
                           batch_size=cfg.train.batch_size,
                           host_id=host_id, num_hosts=num_hosts,
                           seed=args.seed, dpo=cfg.train.dpo,
                           micro_batches=cfg.train.grad_accum)

    eval_batcher = None
    if args.eval_scp:
        eval_samples = load_corpus(CorpusSpec("eval", args.eval_scp))
        if eval_samples:
            eval_batcher = TrainBatcher(eval_samples, cfg.data,
                                        batch_size=cfg.train.batch_size,
                                        seed=args.seed + 1, mix_prob=0.0)

    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        from v2ap_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.mesh, jax.devices())
    tower_kw = {}
    if args.tiny:
        from v2ap_tpu.models.clip_vit import clip_tiny_test
        from v2ap_tpu.models.t5 import t5_tiny_test
        tower_kw = dict(t5_config=t5_tiny_test(),
                        clip_config=clip_tiny_test())
    pipeline = TrainingPipeline(cfg, seed=args.seed,
                                work_dir=args.work_dir, mesh=mesh, **tower_kw)
    final = pipeline.fit(batcher, num_steps=args.steps,
                         eval_batcher=eval_batcher, seed=args.seed)
    print(f"finished at step {final}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

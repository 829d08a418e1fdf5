#!/usr/bin/env python
"""Training entry point.

    python scripts/train.py --corpora-root /data/scps --steps 100000 \
        --batch-size 8 --work-dir runs/v2a

Builds the corpus mix (manifests.default_corpora), the host batcher, and the
TrainingPipeline (device encoders + sharded CFM train step + resilience loop).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpora-root", required=True)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--work-dir", default="runs/v2ap")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--host-id", type=int, default=None,
                    help="defaults to jax.process_index() after "
                         "init_distributed (override for manual launches)")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--no-remat", action="store_true",
                    help="keep all activations (faster per step, needs the "
                         "HBM headroom of a sharded/multi-chip run)")
    ap.add_argument("--no-mesh", action="store_true",
                    help="skip device-mesh sharding (single-device debug)")
    args = ap.parse_args()

    from v2ap_tpu.utils.jitting import enable_compile_cache
    enable_compile_cache()
    # multi-host: no-op single process; on pod slices jax.devices() then
    # spans all hosts and the mesh below is global
    from v2ap_tpu.parallel.distributed import host_shard_info, init_distributed
    init_distributed()
    import jax
    from v2ap_tpu.config import V2APConfig
    from v2ap_tpu.data import TrainBatcher, default_corpora, load_corpora
    from v2ap_tpu.training.pipeline import TrainingPipeline

    host_id, num_hosts = host_shard_info()
    if args.host_id is not None:
        host_id = args.host_id
    if args.num_hosts is not None:
        num_hosts = args.num_hosts

    samples = load_corpora(default_corpora(args.corpora_root))
    if not samples:
        print(f"no samples found under {args.corpora_root}", file=sys.stderr)
        return 2
    batcher = TrainBatcher(samples, batch_size=args.batch_size,
                           host_id=host_id, num_hosts=num_hosts,
                           seed=args.seed)
    import dataclasses
    # remat: the full-size model + f32 AdamW state needs recompute-backward
    # to fit per-chip HBM (see ModelConfig.remat); --no-remat to disable
    cfg = V2APConfig()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                remat=not args.no_remat))
    mesh = None
    if not args.no_mesh and jax.device_count() > 1:
        from v2ap_tpu.parallel import make_mesh
        mesh = make_mesh(cfg.mesh, jax.devices())
    pipeline = TrainingPipeline(cfg, seed=args.seed,
                                work_dir=args.work_dir, mesh=mesh)
    final = pipeline.fit(batcher, num_steps=args.steps, seed=args.seed)
    print(f"finished at step {final}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

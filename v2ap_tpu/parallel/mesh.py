"""Device mesh construction (replaces the reference's HF-Accelerate/NCCL DDP,
reference: trainer_multigpus_alldatas3.py:157-165, src/config.yaml).

One 2-D mesh: ``data`` (batch sharding / gradient allreduce over ICI) and
``model`` (reserved tensor-parallel axis — megatron-style sharding of the
attention/FF projections via GSPMD annotations; SURVEY §2.7)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from v2ap_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    assert dp * mp == n, f"mesh {dp}x{mp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

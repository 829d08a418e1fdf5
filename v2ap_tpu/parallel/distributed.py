"""Multi-host initialisation + cross-host metric reduction.

The reference trains single-machine DDP over a static rendezvous
(src/config.yaml, SURVEY §5.8). The TPU-native equivalent: call
``init_distributed()`` once per host before any jax use (pod slices inject
coordinator env vars automatically; explicit args cover DCN multi-slice),
then build the global mesh as usual — `jax.devices()` spans all hosts and
GSPMD handles the collectives. Per-host input pipelines use
``host_shard_info()`` for the rank striding the batcher expects.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialise jax.distributed when running multi-host. No-ops (returns
    False) for single-process runs so entry points can call unconditionally."""
    import jax

    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    on_pod = any(k in os.environ for k in
                 ("MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"))
    if not explicit and not on_pod:
        return False
    if int(os.environ.get("V2AP_NUM_HOSTS",
                          num_processes or 1)) <= 1 and not on_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes, process_id=process_id)
        return True
    except (RuntimeError, ValueError):
        return jax.process_count() > 1      # already initialised


def host_shard_info() -> Tuple[int, int]:
    """(host_id, num_hosts) for per-host input pipelines (the batcher's
    striding; replaces the reference's manual per-rank striding,
    trainer...3.py:1194,1274)."""
    import jax
    return jax.process_index(), jax.process_count()


def all_hosts_mean(value: float, mesh=None) -> float:
    """Average a host-local python scalar across all hosts (the reference's
    ``gather_for_metrics``, trainer...3.py:302) via a tiny psum."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return float(value)
    arr = multihost_utils.process_allgather(jnp.asarray([value]))
    return float(arr.mean())

"""Two-process jax.distributed correctness (VERDICT r2 next #6).

Spawns two real ``jax.distributed`` CPU processes (4 virtual devices each ->
8 global) and validates, inside the workers:

  * ``host_shard_info`` reports the right (rank, world);
  * TrainBatcher host striding is disjoint across hosts;
  * ``all_hosts_mean`` averages host-local scalars (the reference's
    ``gather_for_metrics``, trainer_multigpus_alldatas3.py:302);
  * a global-mesh jit over per-host shards produces the whole-batch mean on
    both hosts (the gradient-AllReduce pattern of the sharded train step);
  * an all-process orbax save (orbax's own multihost barrier — rank 0
    writes) + restore round-trips exact state on both hosts.

The parent test only orchestrates subprocesses — jax.distributed cannot be
initialised twice in one process.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1]); port = sys.argv[2]; work = sys.argv[3]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.getcwd())
from v2ap_tpu.parallel.distributed import all_hosts_mean, host_shard_info

hid, nh = host_shard_info()
assert (hid, nh) == (rank, 2), (hid, nh)
assert len(jax.devices()) == 8 and jax.local_device_count() == 4

# --- batcher striding disjointness -----------------------------------------
from v2ap_tpu.data import Sample, TrainBatcher
vids = [Sample(f"/v/{i}.mp4", f"c{i}", "v", is_video=True) for i in range(10)]
b = TrainBatcher(vids, batch_size=2, host_id=hid, num_hosts=nh)
mine = {s.path for s in b.video_samples}
expected = {f"/v/{i}.mp4" for i in range(rank, 10, 2)}
assert mine == expected, (rank, mine)

# --- cross-host metric mean -------------------------------------------------
m = all_hosts_mean(float(rank + 1))       # hosts hold 1.0 and 2.0
assert abs(m - 1.5) < 1e-6, m

# --- global-mesh jit over per-host shards (AllReduce pattern) ---------------
mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("data",))
sharding = NamedSharding(mesh, P("data"))
local = np.full((4, 3), float(rank), np.float32)   # each host its own rows
garr = jax.make_array_from_process_local_data(sharding, local, (8, 3))
mean = jax.jit(lambda x: jnp.mean(x),
               out_shardings=NamedSharding(mesh, P()))(garr)
assert abs(float(mean) - 0.5) < 1e-6, float(mean)

# --- rank-0 orbax save + cross-host restore ---------------------------------
from flax import nnx
import optax
from v2ap_tpu.config import tiny_test, TrainConfig
from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.training.trainer import Trainer
from v2ap_tpu.utils.checkpoint import CheckpointManager

cfg = tiny_test()
model = CFM(cfg.model, cfg.conditioning, with_video2roll=False,
            rngs=nnx.Rngs(0))
trainer = Trainer(model, TrainConfig(warmup_steps=1, decay_steps=10))
# orbax coordinates multihost saves internally — EVERY process calls save
# (rank 0 writes, the rest join the barrier), exactly what AutoResumer does
mgr = CheckpointManager(os.path.join(work, "ckpt"))
mgr.save(7, trainer.model, trainer.optimizer)

model2 = CFM(cfg.model, cfg.conditioning, with_video2roll=False,
             rngs=nnx.Rngs(1))
trainer2 = Trainer(model2, TrainConfig(warmup_steps=1, decay_steps=10))
step = mgr.restore(trainer2.model, trainer2.optimizer)
assert step == 7, step
a = nnx.state(trainer.model, nnx.Param)
bstate = nnx.state(trainer2.model, nnx.Param)
jax.tree.map(lambda x, y: np.testing.assert_allclose(np.asarray(x),
                                                     np.asarray(y)),
             a, bstate)
print(f"WORKER_{rank}_OK")
"""


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # isolate from the parent's persistent compile cache (different device
    # topology would poison it) and from any TPU tunnel
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), str(port), str(tmp_path)],
            env=env, cwd="/root/repo", stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out\n" + "\n".join(outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"WORKER_{rank}_OK" in out, out[-2000:]

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


CRASH_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1]); port = sys.argv[2]; work = sys.argv[3]
phase = sys.argv[4]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=rank)
import numpy as np
sys.path.insert(0, os.getcwd())
from flax import nnx
from v2ap_tpu.config import tiny_test, TrainConfig
from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.training.trainer import Trainer
from v2ap_tpu.utils.checkpoint import CheckpointManager

cfg = tiny_test()
mgr = CheckpointManager(os.path.join(work, "ckpt"))

if phase == "crash":
    model = CFM(cfg.model, cfg.conditioning, with_video2roll=False,
                rngs=nnx.Rngs(0))
    trainer = Trainer(model, TrainConfig(warmup_steps=1, decay_steps=10))
    mgr.save(1, trainer.model, trainer.optimizer)       # committed save
    print(f"WORKER_{rank}_SAVED_1", flush=True)
    if rank == 0:
        # SIGKILL-equivalent at the atomic-commit boundary of step 2: the
        # step data is fully written but the rename that makes it visible
        # never lands — the worst-case interrupted write
        real_rename, real_replace = os.rename, os.replace

        def boom(src, dst, *a, **k):
            if os.path.basename(str(dst)) == "2":
                os._exit(42)
            return real_rename(src, dst, *a, **k)

        def boom2(src, dst, *a, **k):
            if os.path.basename(str(dst)) == "2":
                os._exit(42)
            return real_replace(src, dst, *a, **k)

        os.rename, os.replace = boom, boom2
    mgr.save(2, trainer.model, trainer.optimizer)
    # only rank 1 can reach here (and only if orbax let it past the barrier)
    print(f"WORKER_{rank}_SAVED_2", flush=True)
else:                                 # phase == "restore"
    model2 = CFM(cfg.model, cfg.conditioning, with_video2roll=False,
                 rngs=nnx.Rngs(1))
    trainer2 = Trainer(model2, TrainConfig(warmup_steps=1, decay_steps=10))
    assert mgr.latest_step() == 1, mgr.latest_step()   # step 2 must be invisible
    step = mgr.restore(trainer2.model, trainer2.optimizer)
    assert step == 1, step
    ref = CFM(cfg.model, cfg.conditioning, with_video2roll=False,
              rngs=nnx.Rngs(0))                         # what was saved
    a = nnx.state(trainer2.model, nnx.Param)
    b = nnx.state(ref, nnx.Param)
    jax.tree.map(lambda x, y: np.testing.assert_allclose(
        np.asarray(x), np.asarray(y)), a, b)
    print(f"WORKER_{rank}_RESTORED", flush=True)
"""


@pytest.mark.slow
def test_multihost_ckpt_kill_resume(tmp_path):
    """Kill/resume drill (VERDICT r3 next #9): rank 0 dies at the atomic
    commit of a 2-process orbax save; a fresh 2-process run must restore the
    previous committed step, with the interrupted step invisible."""
    import time

    def free_port():
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            return s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    script = tmp_path / "crash_worker.py"
    script.write_text(CRASH_WORKER)

    def run_phase(phase, expect_crash):
        port = free_port()
        procs = [subprocess.Popen(
            [sys.executable, str(script), str(rank), str(port),
             str(tmp_path), phase],
            env=env, cwd="/root/repo", stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True) for rank in range(2)]
        if expect_crash:
            # rank 0 must die with the sentinel exit code; rank 1 then hangs
            # in orbax's cross-host barrier — kill it like the scheduler would
            deadline = time.monotonic() + 420
            while procs[0].poll() is None and time.monotonic() < deadline:
                time.sleep(1.0)
            out0 = ""
            if procs[0].poll() is None:
                procs[0].kill()
                out0, _ = procs[0].communicate()
                procs[1].kill()
                procs[1].communicate()
                pytest.fail("rank 0 never hit the commit kill point\n" + out0)
            out0, _ = procs[0].communicate()
            time.sleep(2.0)
            procs[1].kill()
            out1, _ = procs[1].communicate()
            assert procs[0].returncode == 42, (procs[0].returncode, out0[-3000:])
            assert "WORKER_0_SAVED_1" in out0, out0[-3000:]
            assert "WORKER_0_SAVED_2" not in out0
            return [out0, out1]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.fail("restore phase timed out")
            outs.append(out)
        for rank, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
            assert f"WORKER_{rank}_RESTORED" in out, out[-2000:]
        return outs

    run_phase("crash", expect_crash=True)
    # the committed step-1 dir exists; step 2 never became visible
    ckpt = tmp_path / "ckpt"
    assert (ckpt / "1").exists()
    assert not (ckpt / "2").exists()
    run_phase("restore", expect_crash=False)

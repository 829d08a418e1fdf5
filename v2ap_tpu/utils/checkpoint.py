"""Orbax checkpointing: exact state (params / optimizer / EMA / step / rng).

The reference saved a bare model ``state_dict`` every ``save_step`` and its
resume path always restarted schedules from step 0
(trainer_multigpus_alldatas3.py:205-216,269). Here checkpoints are complete
and resumable, and the frozen encoder stacks (EnCodec/T5/CLIP/Video2Roll) are
saved under their own keys so a serving process can load only what it needs.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp
from flax import nnx


def _state_to_pure(state) -> Any:
    return jax.tree.map(lambda x: x, nnx.to_pure_dict(state)) \
        if hasattr(nnx, "to_pure_dict") else state


def save_model(path: str, model: nnx.Module, *, step: int = 0,
               extra: Optional[dict] = None) -> None:
    """Save an nnx module's full state (+ scalars) to ``path`` (directory)."""
    path = os.path.abspath(path)
    state = nnx.state(model)
    pure = nnx.to_pure_dict(state)
    payload = {"state": pure, "meta": {"step": np.asarray(step)}}
    if extra:
        payload["extra"] = extra
    ckpter = ocp.StandardCheckpointer()
    ckpter.save(path, payload, force=True)
    ckpter.wait_until_finished()


def load_model(path: str, model: nnx.Module) -> int:
    """Restore state saved by :func:`save_model` into ``model`` in place.
    Returns the saved step."""
    path = os.path.abspath(path)
    state = nnx.state(model)
    pure = nnx.to_pure_dict(state)
    template = {"state": pure, "meta": {"step": np.asarray(0)}}
    ckpter = ocp.StandardCheckpointer()
    restored = ckpter.restore(path, template)
    nnx.replace_by_pure_dict(state, restored["state"])
    nnx.update(model, state)
    return int(restored["meta"]["step"])


def _replicated_global_sharding():
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("all",))
    return jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())


def _is_global(x) -> bool:
    return (isinstance(x, jax.Array)
            and isinstance(x.sharding, jax.sharding.NamedSharding)
            and x.sharding.mesh.devices.size == len(jax.devices()))


def _globalize(payload):
    """Multi-host: orbax refuses host-local (single-device) jax.Arrays — every
    process must hand it globally-addressable arrays. Mesh-sharded params
    already are; UNSHARDED leaves (e.g. a model built outside shard_model)
    get rebuilt as fully-replicated global arrays (all hosts hold identical
    values for such leaves — they were constructed/updated in lockstep)."""
    if jax.process_count() == 1:
        return payload
    sharding = _replicated_global_sharding()

    def conv(x):
        if not isinstance(x, jax.Array) or _is_global(x):
            return x
        if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            # typed PRNG keys: globalize the underlying uint32 data, re-wrap
            data = np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_callback(data.shape, sharding,
                                             lambda idx: data[idx])
            return jax.random.wrap_key_data(g, impl=jax.random.key_impl(x))
        val = np.asarray(x)
        return jax.make_array_from_callback(val.shape, sharding,
                                            lambda idx: val[idx])

    return jax.tree.map(conv, payload)


def _localize(template, restored):
    """Leaves that save-time globalization rebuilt as replicated arrays come
    back as host numpy (each host holds full values); genuinely mesh-sharded
    leaves keep their global sharding."""
    if jax.process_count() == 1:
        return restored

    def conv(orig, r):
        if not (isinstance(r, jax.Array) and isinstance(orig, jax.Array)
                and not _is_global(orig)):
            return r
        if jax.dtypes.issubdtype(r.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(r).addressable_data(0))
            return jax.random.wrap_key_data(
                jax.numpy.asarray(data), impl=jax.random.key_impl(orig))
        return np.asarray(r.addressable_data(0))

    return jax.tree.map(conv, template, restored)


class CheckpointManager:
    """Rolling training checkpoints with keep-last-N semantics.

    Multi-host: call ``save``/``restore`` from EVERY process (orbax runs its
    own cross-host barrier; rank 0 writes the data)."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                               create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, model: nnx.Module,
             optimizer: Optional[nnx.Optimizer] = None,
             ema: Optional[nnx.Module] = None) -> None:
        payload = {"model": nnx.to_pure_dict(nnx.state(model))}
        if optimizer is not None:
            payload["opt"] = nnx.to_pure_dict(nnx.state(optimizer))
        if ema is not None:
            payload["ema"] = nnx.to_pure_dict(nnx.state(ema))
        self._mgr.save(step, args=ocp.args.StandardSave(_globalize(payload)))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, model: nnx.Module,
                optimizer: Optional[nnx.Optimizer] = None,
                ema: Optional[nnx.Module] = None,
                step: Optional[int] = None) -> int:
        step = self._mgr.latest_step() if step is None else step
        assert step is not None, "no checkpoint found"
        template = {"model": nnx.to_pure_dict(nnx.state(model))}
        if optimizer is not None:
            template["opt"] = nnx.to_pure_dict(nnx.state(optimizer))
        if ema is not None:
            template["ema"] = nnx.to_pure_dict(nnx.state(ema))
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_globalize(template)))
        restored = _localize(template, restored)

        def put_back(module, key):
            st = nnx.state(module)
            nnx.replace_by_pure_dict(st, restored[key])
            nnx.update(module, st)

        put_back(model, "model")
        if optimizer is not None and "opt" in restored:
            put_back(optimizer, "opt")
        if ema is not None and "ema" in restored:
            put_back(ema, "ema")
        return step

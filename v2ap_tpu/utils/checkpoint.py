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


class CheckpointManager:
    """Rolling training checkpoints with keep-last-N semantics."""

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
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
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
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))

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

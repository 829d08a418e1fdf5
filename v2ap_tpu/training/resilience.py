"""Failure detection and recovery for long training runs.

The reference's resilience is data-level only: try/except around media
decodes, bad-sample blacklists, and a redraw loop in the collate
(SURVEY §5.3); crashes lose all schedule state because resume restarts at
step 0 (trainer...3.py:269). This module adds the training-level guards the
reference lacks:

  * ``GradGuard``     — skip optimizer updates on non-finite loss/grads and
    count incidents (a poisoned batch cannot corrupt the params);
  * ``Watchdog``      — heartbeat file + stall detection for external
    supervisors;
  * ``AutoResumer``   — crash-safe loop: periodic full-state checkpoints via
    ``CheckpointManager`` and exact-step resume on restart.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx


def tree_all_finite(tree) -> jnp.ndarray:
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return jnp.asarray(True)
    finite = [jnp.all(jnp.isfinite(x)) for x in leaves
              if jnp.issubdtype(x.dtype, jnp.floating)]
    return jnp.all(jnp.stack(finite)) if finite else jnp.asarray(True)


def make_guarded_update():
    """Jitted: apply grads only when loss and all grads are finite.
    Returns (applied: bool). Uses a zero-grad update on the skip path so the
    program keeps a single trace."""

    @nnx.jit
    def guarded(model, optimizer, grads, loss):
        ok = jnp.isfinite(loss) & tree_all_finite(nnx.to_flat_state(grads))
        zero_like = jax.tree.map(
            lambda g: jnp.zeros_like(g) if hasattr(g, "dtype") else g, grads)
        safe = jax.tree.map(
            lambda g, z: jnp.where(ok, g, z) if hasattr(g, "dtype") else g,
            grads, zero_like)
        optimizer.update(model, safe)
        return ok

    return guarded


class GradGuard:
    def __init__(self, max_consecutive_skips: int = 50):
        self._update = make_guarded_update()
        self.skipped = 0
        self.consecutive = 0
        self.max_consecutive = max_consecutive_skips

    def apply(self, model, optimizer, grads, loss) -> bool:
        ok = bool(self._update(model, optimizer, grads, loss))
        if ok:
            self.consecutive = 0
        else:
            self.skipped += 1
            self.consecutive += 1
            if self.consecutive >= self.max_consecutive:
                raise RuntimeError(
                    f"{self.consecutive} consecutive non-finite steps — "
                    "training diverged")
        return ok


class Watchdog:
    """Heartbeat file for external supervisors; detects in-process stalls."""

    def __init__(self, path: str, stall_seconds: float = 1800.0):
        self.path = path
        self.stall_seconds = stall_seconds
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.beat(step=0)

    def beat(self, step: int, **extra) -> None:
        rec = {"step": step, "time": time.time()}
        rec.update(extra)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self.path)

    @staticmethod
    def is_stalled(path: str, stall_seconds: float = 1800.0) -> bool:
        try:
            with open(path) as f:
                rec = json.load(f)
            return time.time() - rec["time"] > stall_seconds
        except Exception:
            return True


class AutoResumer:
    """Wraps a Trainer with periodic exact-state checkpoints and resume."""

    def __init__(self, trainer, ckpt_dir: str, save_every: int = 1000,
                 max_to_keep: int = 3):
        from v2ap_tpu.utils.checkpoint import CheckpointManager
        self.trainer = trainer
        self.save_every = save_every
        self.mgr = CheckpointManager(ckpt_dir, max_to_keep=max_to_keep)

    def maybe_resume(self) -> int:
        step = self.mgr.latest_step()
        if step is None:
            return 0
        self.mgr.restore(self.trainer.model, self.trainer.optimizer,
                         ema=self.trainer.ema.shadow if self.trainer.ema else None,
                         step=step)
        self.trainer.step = step
        return step

    def maybe_save(self) -> bool:
        if self.trainer.step % self.save_every != 0 or self.trainer.step == 0:
            return False
        self.mgr.save(self.trainer.step, self.trainer.model,
                      self.trainer.optimizer,
                      ema=self.trainer.ema.shadow if self.trainer.ema else None)
        return True

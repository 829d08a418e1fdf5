"""Determinism / numerical-sanity checks (the reference has none —
SURVEY §5.2; its only determinism lever was a val-seed pin).

  * ``assert_deterministic`` — run a jitted function twice and demand
    bit-identical outputs (catches nondeterministic collectives/kernels);
  * ``debug_nans`` — context manager turning on jax NaN-trapping;
  * ``tree_finite_report`` — name every non-finite leaf in a pytree/state.
"""

from __future__ import annotations

import contextlib
from typing import Callable, List

import jax
import numpy as np


def assert_deterministic(fn: Callable, *args, runs: int = 2, **kwargs) -> None:
    ref = jax.tree.map(np.asarray, fn(*args, **kwargs))
    for i in range(1, runs):
        out = jax.tree.map(np.asarray, fn(*args, **kwargs))
        leaves_a = jax.tree.leaves(ref)
        leaves_b = jax.tree.leaves(out)
        for a, b in zip(leaves_a, leaves_b):
            if not np.array_equal(a, b, equal_nan=True):
                diff = np.max(np.abs(np.asarray(a, np.float64)
                                     - np.asarray(b, np.float64)))
                raise AssertionError(
                    f"non-deterministic output on run {i}: max |delta|={diff}")


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def tree_finite_report(tree, prefix: str = "") -> List[str]:
    """Paths of non-finite leaves (works on nnx states and plain pytrees)."""
    bad = []
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        arr = getattr(leaf, "value", leaf)
        if hasattr(arr, "dtype") and np.issubdtype(arr.dtype, np.floating):
            if not bool(np.isfinite(np.asarray(arr)).all()):
                bad.append(prefix + jax.tree_util.keystr(path))
    return bad

"""Parameter/batch sharding rules (GSPMD; scaling-book recipe: pick a mesh,
annotate shardings, let XLA insert the collectives).

Data parallel: batch arrays sharded on ``data``; gradients allreduce over ICI
automatically under ``jit`` (the reference's NCCL allreduce in
``accelerator.backward``, trainer...3.py:414, becomes an XLA AllReduce).

Tensor parallel (optional, ``model`` axis): megatron-style column/row sharding
of the attention qkv/out and FF in/out projections, expressed purely as
NamedSharding annotations on the parameter pytree — no code changes in the
model; XLA inserts the all-reduces after row-parallel matmuls.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from flax import nnx

# param-path suffixes sharded column-wise (output dim split over 'model')
_COL_SUFFIXES = (
    ("to_q", "kernel"), ("to_k", "kernel"), ("to_v", "kernel"),
    ("to_qkv", "kernel"),
    ("proj_in", "kernel"),          # GLU FF input projection
    ("wi_0", "kernel"), ("wi_1", "kernel"),  # T5 FF
    ("q", "kernel"), ("k", "kernel"), ("v", "kernel"),
    ("fc1", "kernel"),
)
# row-wise (input dim split; XLA adds the psum)
_ROW_SUFFIXES = (
    ("to_out", "kernel"), ("proj_out", "kernel"), ("wo", "kernel"),
    ("o", "kernel"), ("fc2", "kernel"),
)


def _path_names(path) -> tuple:
    # nnx flat-state paths are plain tuples of str (attributes) / int (list
    # indices)
    return tuple(str(p) for p in path)


def param_spec(path, value, model_axis: str, model_size: int) -> P:
    names = _path_names(path)
    if model_size <= 1 or not hasattr(value, "ndim") or value.ndim < 2:
        return P()
    for suf in _COL_SUFFIXES:
        if names[-len(suf):] == suf and value.shape[-1] % model_size == 0:
            return P(*([None] * (value.ndim - 1)), model_axis)
    for suf in _ROW_SUFFIXES:
        if names[-len(suf):] == suf and value.shape[-2] % model_size == 0:
            return P(*([None] * (value.ndim - 2)), model_axis, None)
    return P()


def shard_model(model: nnx.Module, mesh: Mesh) -> None:
    """Place every parameter of an nnx model according to the TP rules
    (in place). With model_parallel == 1 this fully replicates."""
    model_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    model_size = mesh.shape.get(model_axis, 1) if model_axis else 1
    graphdef, state = nnx.split(model)
    flat = nnx.to_flat_state(state)
    new = []
    for path, leaf in flat:
        val = leaf.get_value() if hasattr(leaf, "get_value") else leaf
        if hasattr(val, "ndim"):
            spec = param_spec(path, val, model_axis, model_size)
            val = jax.device_put(val, NamedSharding(mesh, spec))
            if hasattr(leaf, "replace"):
                leaf = leaf.replace(val)
            else:
                leaf = val
        new.append((path, leaf))
    nnx.update(model, nnx.from_flat_state(new))


def state_shardings(model: nnx.Module, mesh: Mesh) -> Any:
    """NamedSharding pytree matching nnx.state(model) (for jit in/out specs)."""
    model_axis = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    model_size = mesh.shape.get(model_axis, 1) if model_axis else 1
    state = nnx.state(model)
    flat = nnx.to_flat_state(state)
    out = []
    for path, leaf in flat:
        val = leaf.get_value() if hasattr(leaf, "get_value") else leaf
        spec = param_spec(path, val, model_axis, model_size) \
            if hasattr(val, "ndim") else P()
        out.append((path, NamedSharding(mesh, spec)))
    return nnx.from_flat_state(out)

"""Normalization layers: RMSNorm, time-conditioned AdaptiveRMSNorm, AdaLN-Zero gate.

Behavioral parity targets (math, not code) in the reference:
  - RMSNorm / AdaptiveRMSNorm: x_transformers semantics used by
    e2_tts_crossatt3.py:38-45 — ``l2_normalize(x) * sqrt(dim) * g`` and the
    adaptive variant scaling by ``(1 + Linear_0init(cond))``.
  - AdaLNZero: e2_tts_crossatt3.py:532-551 — sigmoid gate with bias init -2.

Norms run in float32 regardless of the compute dtype: they are reduction-heavy,
cheap relative to matmuls, and precision-critical for flow-matching training.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # torch F.normalize semantics: x / max(||x||, eps). The max goes *inside*
    # the sqrt so the gradient at x == 0 is finite (jnp.linalg.norm has a NaN
    # vjp at exactly zero, which zero-init streams do hit).
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


class RMSNorm(nnx.Module):
    """l2-normalize * sqrt(dim) * learned gain."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        self.scale = float(dim) ** 0.5
        self.g = nnx.Param(jnp.ones((dim,), jnp.float32))

    def __call__(self, x: jnp.ndarray, **_) -> jnp.ndarray:
        dtype = x.dtype
        x = x.astype(jnp.float32)
        out = _l2_normalize(x) * self.scale * self.g[...]
        return out.astype(dtype)


class AdaptiveRMSNorm(nnx.Module):
    """RMSNorm whose gain is (1 + W·cond) with W zero-initialised.

    ``condition`` is the time embedding, shape (b, dim_condition).
    """

    def __init__(self, dim: int, dim_condition: int | None = None, *, rngs: nnx.Rngs):
        dim_condition = dim_condition or dim
        self.scale = float(dim) ** 0.5
        self.to_gamma = nnx.Linear(
            dim_condition, dim, use_bias=False,
            kernel_init=nnx.initializers.zeros_init(),
            param_dtype=jnp.float32, dtype=jnp.float32, rngs=rngs,
        )

    def __call__(self, x: jnp.ndarray, *, condition: jnp.ndarray | None = None,
                 gamma: jnp.ndarray | None = None) -> jnp.ndarray:
        dtype = x.dtype
        x = x.astype(jnp.float32)
        normed = _l2_normalize(x) * self.scale
        if gamma is None:
            # ``gamma`` may be precomputed by the caller (the transformer
            # fuses every layer's cond projection into one stacked matmul —
            # see TriStreamTransformer._fused_cond_gammas); it is the RAW
            # projection output, the (+1) happens here either way.
            gamma = self.to_gamma(condition.astype(jnp.float32))
        if gamma.ndim == 2:
            gamma = gamma[:, None, :]
        return (normed * (gamma.astype(jnp.float32) + 1.0)).astype(dtype)


class AdaLNZero(nnx.Module):
    """Post-branch sigmoid gate conditioned on time (DiT AdaLN-Zero flavor).

    Bias init -2 => initial gate ≈ 0.12, so residual branches start damped.
    """

    def __init__(self, dim: int, dim_condition: int | None = None,
                 init_bias_value: float = -2.0, *, rngs: nnx.Rngs):
        dim_condition = dim_condition or dim
        self.to_gamma = nnx.Linear(
            dim_condition, dim,
            kernel_init=nnx.initializers.zeros_init(),
            bias_init=nnx.initializers.constant(init_bias_value),
            param_dtype=jnp.float32, dtype=jnp.float32, rngs=rngs,
        )

    def __call__(self, x: jnp.ndarray, *, condition: jnp.ndarray | None = None,
                 gamma: jnp.ndarray | None = None) -> jnp.ndarray:
        dtype = x.dtype
        if gamma is None:
            # ``gamma`` = precomputed PRE-SIGMOID logits (kernel@cond + bias);
            # see AdaptiveRMSNorm for the fused-projection rationale.
            if condition.ndim == 2:
                condition = condition[:, None, :]
            gamma = self.to_gamma(condition.astype(jnp.float32))
        elif gamma.ndim == 2:
            gamma = gamma[:, None, :]
        gate = nnx.sigmoid(gamma.astype(jnp.float32))
        return (x.astype(jnp.float32) * gate).astype(dtype)


class Identity(nnx.Module):
    def __call__(self, x: jnp.ndarray, **_) -> jnp.ndarray:
        return x

"""Rotary position embeddings (GPT-NeoX half-split flavor).

Matches the math of the x_transformers ``RotaryEmbedding`` used per-stream in
the reference (e2_tts_crossatt3.py:777-781): ``inv_freq = base^(-2i/d)``,
frequencies duplicated across both halves, ``rotate_half`` = split-in-two and
negate the second half. Rotary is applied to q/k of self-attention only —
cross-attention (T5 context) receives no rotary.

Pure functions; the table is precomputed once per sequence length and closed
over by the jitted forward, so inside ``jit`` it is a constant in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_table(seq_len: int, dim: int, base: float = 10_000.0) -> jnp.ndarray:
    """Return freqs of shape (seq_len, dim): angle per position/feature."""
    assert dim % 2 == 0
    inv_freq = 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.einsum("i,j->ij", t, inv_freq)          # (n, dim/2)
    return jnp.concatenate([freqs, freqs], axis=-1)      # (n, dim)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(t: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotate the last dim of t (..., n, d) by freqs (n, d).

    If t's head dim is wider than the rope table, the tail is left unrotated
    (partial-rotary); if the table is longer than the sequence, the *last*
    seq_len rows are used (x_transformers convention).
    """
    rot_dim = freqs.shape[-1]
    seq_len = t.shape[-2]
    freqs = freqs[-seq_len:, :]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    dtype = t.dtype
    t_rot = t_rot.astype(jnp.float32)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    t_rot = t_rot * cos + _rotate_half(t_rot) * sin
    return jnp.concatenate([t_rot.astype(dtype), t_pass], axis=-1)

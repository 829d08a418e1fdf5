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

import os

import jax.numpy as jnp

# V2AP_ROPE_BF16=1: rotate bf16 q/k in bf16 instead of round-tripping
# through f32. Kills the cast fusions around every rotary application (the
# b24 train-step op profile attributed ~50 ms/step to them, NOTES.md r4s3)
# at a ~4e-3 relative rotation error from bf16 cos/sin — smaller than the
# accepted bf16 compute-dtype drift. f32 inputs (all parity/golden tests)
# are never affected. Opt-in until the A/B timing is recorded in NOTES.
_ROPE_BF16 = os.environ.get("V2AP_ROPE_BF16", "0") == "1"


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


def apply_rope(t: jnp.ndarray, freqs: jnp.ndarray,
               seq_axis: int = -2) -> jnp.ndarray:
    """Rotate the last dim of t by freqs (n, d); the sequence dim of ``t``
    is ``seq_axis`` (default -2 for (..., n, d); pass 1 for (b, n, h, d)).

    If t's head dim is wider than the rope table, the tail is left unrotated
    (partial-rotary); if the table is longer than the sequence, the *last*
    seq_len rows are used (x_transformers convention).

    Implementation note: the table duplicates freqs across both halves, so
    rather than the literal ``t*cos + rotate_half(t)*sin`` (split + negate +
    two concats — the train-step op profile attributed ~21 ms/step to these
    rotary slice/negate/copy fusions, NOTES.md), the two halves are rotated
    directly and concatenated once:
        o1 = x1*cos - x2*sin ;  o2 = x2*cos + x1*sin
    which is the same complex rotation with half the layout copies.
    """
    rot_dim = freqs.shape[-1]
    sa = seq_axis % t.ndim
    seq_len = t.shape[sa]
    half = rot_dim // 2
    freqs_h = freqs[-seq_len:, :half]        # both halves share these angles
    if sa != t.ndim - 2:                     # broadcast across dims after seq
        freqs_h = freqs_h.reshape(
            (seq_len,) + (1,) * (t.ndim - 2 - sa) + (half,))
    t_pass = t[..., rot_dim:]
    dtype = t.dtype
    cdt = (dtype if _ROPE_BF16 and dtype == jnp.bfloat16 else jnp.float32)
    x1 = t[..., :half].astype(cdt)
    x2 = t[..., half:rot_dim].astype(cdt)
    cos = jnp.cos(freqs_h).astype(cdt)
    sin = jnp.sin(freqs_h).astype(cdt)
    o1 = (x1 * cos - x2 * sin).astype(dtype)
    o2 = (x2 * cos + x1 * sin).astype(dtype)
    if t_pass.shape[-1] == 0:
        return jnp.concatenate([o1, o2], axis=-1)
    return jnp.concatenate([o1, o2, t_pass], axis=-1)

"""Fused flash attention for TPU (Pallas), with logit soft-clamping and
key-padding masks.

This is the hot op of the whole framework: every Euler step runs
12 layers × 3 streams of it (reference hot loop: e2_tts_crossatt3.py:2255,
1126-1135). Design notes (see /opt/skills/guides/pallas_guide.md):

  * grid = (batch*heads, q-blocks); K/V for the (b,h) program live in VMEM and
    are revisited across q-blocks (qi is the fastest-varying grid dim, so the
    pipeline keeps them resident).
  * online softmax over K chunks of ``block_k`` — running max/denominator in
    f32, logits computed on the MXU with ``preferred_element_type=f32``.
  * optional logit softclamp ``v*tanh(s/v)`` fused before masking.
  * key-padding mask is a (b, n_k) bool array; fully-masked rows are guarded
    by an epsilon denominator.

Falls back to a pure-XLA reference implementation (`attention_reference`) on
CPU or when shapes are too small to tile; the Pallas path requires seq lengths
padded to multiples of the block sizes (the caller pads — all sequence lengths
in this framework are bucketed to multiples of 128 anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# --------------------------------------------------------------------------- #
# Reference (XLA) path — also the CPU/test oracle
# --------------------------------------------------------------------------- #

def attention_reference(
    q: jnp.ndarray,                    # (b, h, nq, d)
    k: jnp.ndarray,                    # (b, h, nk, d)
    v: jnp.ndarray,                    # (b, h, nk, d)
    kv_mask: jnp.ndarray | None = None,  # (b, nk) True == attend
    softclamp: float | None = None,
    scale: float | None = None,
) -> jnp.ndarray:
    d = q.shape[-1]
    scale = scale if scale is not None else d ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    if softclamp is not None:
        s = jnp.tanh(s / softclamp) * softclamp
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


# --------------------------------------------------------------------------- #
# Pallas kernel
# --------------------------------------------------------------------------- #

def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                  scale: float, softclamp: float | None, block_k: int,
                  heads: int):
    # q_ref: (1, 1, bq, d); k_ref/v_ref: (1, 1, nk, d)
    # mask_ref: full (b, nk) array in VMEM (un-blocked: TPU requires the last
    # two block dims be 8/128-aligned OR equal to the array dims)
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, d)
    nk = k_ref.shape[2]
    bq = q.shape[0]
    num_kb = nk // block_k
    batch_idx = pl.program_id(0) // heads

    def body(i, carry):
        m_prev, l_prev, acc = carry
        ks = k_ref[0, 0, pl.ds(i * block_k, block_k), :]  # (bk, d)
        vs = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, ks.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                 # (bq, bk)
        if softclamp is not None:
            s = jnp.tanh(s / softclamp) * softclamp
        mk = mask_ref[batch_idx, pl.ds(i * block_k, block_k)]  # (bk,) int32
        s = jnp.where(mk[None, :] != 0, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))  # (bq,)
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p, vs.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_cur, l_cur, acc

    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    _, l, acc = lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)


def _pick_block(n: int, target: int) -> int:
    b = min(n, target)
    while n % b != 0:
        b //= 2
    return max(b, 1)


def _flash_impl(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                interpret):
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bq = _pick_block(nq, block_q)
    bk = _pick_block(nk, block_k)
    grid = (b * h, nq // bq)

    kernel = functools.partial(
        _flash_kernel, scale=scale, softclamp=softclamp, block_k=bk, heads=h)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda bh, qi: (bh // h, bh % h, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, d), lambda bh, qi: (bh // h, bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, d), lambda bh, qi: (bh // h, bh % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nk), lambda bh, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda bh, qi: (bh // h, bh % h, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, k, v, mask_arr)


# Training differentiates through the attention op; Pallas kernels are not
# reverse-differentiable (Mosaic cannot lower the transposed fori_loop), so
# the backward pass recomputes attention with the XLA reference math and
# takes its VJP — the standard flash-attention recompute trade: O(n) memory
# forward, one extra attention evaluation in backward.
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_ad(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
              interpret):
    return _flash_impl(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                       interpret)


def _flash_ad_fwd(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                  interpret):
    out = _flash_impl(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                      interpret)
    return out, (q, k, v, mask_arr)


def _flash_ad_bwd(softclamp, scale, block_q, block_k, interpret, res, g):
    # f32 reference math: measured FASTER than a bf16-matmul variant on v5e
    # (469 vs 511 ms full train step — XLA fuses the f32 softmax chain
    # better than the cast-heavy bf16 one) and gradient-exact vs the oracle.
    q, k, v, mask_arr = res

    def ref(q_, k_, v_):
        return attention_reference(q_, k_, v_, mask_arr != 0,
                                   softclamp=softclamp, scale=scale)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_ad.defvjp(_flash_ad_fwd, _flash_ad_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("softclamp", "scale", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jnp.ndarray,                      # (b, h, nq, d)
    k: jnp.ndarray,                      # (b, h, nk, d)
    v: jnp.ndarray,                      # (b, h, nk, d)
    kv_mask: jnp.ndarray | None = None,  # (b, nk)
    *,
    softclamp: float | None = None,
    scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, nq, d = q.shape
    nk = k.shape[2]
    scale = scale if scale is not None else d ** -0.5

    if kv_mask is None:
        mask_arr = jnp.ones((b, nk), jnp.int32)
    else:
        mask_arr = kv_mask.astype(jnp.int32)

    return _flash_ad(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                     interpret)


def use_pallas_default() -> bool:
    """Pallas path only on real TPU backends."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False

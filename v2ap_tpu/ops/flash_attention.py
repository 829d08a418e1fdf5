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
import os

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

def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _online_softmax(q, k_ref, v_ref, mask_ref, batch_idx, block_k,
                    softclamp):
    """Shared forward loop: q is the pre-scaled (bq, d) f32 block; returns
    (acc, l, m) of the online softmax over all K blocks."""
    nk = k_ref.shape[2]
    bq = q.shape[0]
    num_kb = nk // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        ks = k_ref[0, 0, pl.ds(i * block_k, block_k), :]  # (bk, d)
        vs = v_ref[0, 0, pl.ds(i * block_k, block_k), :]
        s = _dot(q, ks.astype(jnp.float32), ((1,), (1,)))  # (bq, bk)
        if softclamp is not None:
            s = jnp.tanh(s / softclamp) * softclamp
        mk = mask_ref[batch_idx, pl.ds(i * block_k, block_k)]  # (bk,) int32
        s = jnp.where(mk[None, :] != 0, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))  # (bq,)
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + _dot(p, vs.astype(jnp.float32),
                                          ((1,), (0,)))
        return m_cur, l_cur, acc

    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, q.shape[1]), jnp.float32)
    m, l, acc = lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    return acc, l, m


def _flash_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                  scale: float, softclamp: float | None, block_k: int,
                  heads: int):
    # q_ref: (1, 1, bq, d); k_ref/v_ref: (1, 1, nk, d)
    # mask_ref: full (b, nk) array in VMEM (un-blocked: TPU requires the last
    # two block dims be 8/128-aligned OR equal to the array dims)
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, d)
    batch_idx = pl.program_id(0) // heads
    acc, l, _ = _online_softmax(q, k_ref, v_ref, mask_ref, batch_idx,
                                block_k, softclamp)
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)


def _flash_kernel_lse(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, *,
                      scale: float, softclamp: float | None, block_k: int,
                      heads: int):
    """Forward that also writes the log-sum-exp per query row — the
    backward kernels reconstruct p = exp(s - lse) from it. lse shaped
    (b, h, nq, 1): trailing size-1 dim satisfies the TPU block-alignment
    rule (block dim == array dim)."""
    q = q_ref[0, 0].astype(jnp.float32) * scale
    batch_idx = pl.program_id(0) // heads
    acc, l, m = _online_softmax(q, k_ref, v_ref, mask_ref, batch_idx,
                                block_k, softclamp)
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype)
    lse_ref[0, 0] = (m + jnp.log(jnp.maximum(l, 1e-30)))[:, None]


def _recompute_p(qs, k_blk, mk, lse_rows, softclamp):
    """(p, deriv): softmax probs from saved lse + the softclamp chain-rule
    factor d(clamped)/d(raw) = 1 - (clamped/c)^2. qs arrives pre-scaled.

    Masked probabilities are zeroed explicitly rather than relying on
    exp(NEG_INF - lse): for a fully-masked kv row the stored lse is itself
    ~NEG_INF and the terms cancel in f32, which would yield p = 1 for every
    key and silently corrupt dq/dk/dv. Zeroing also makes fully-masked rows
    contribute exactly zero gradient."""
    s = _dot(qs, k_blk, ((1,), (1,)))                    # (bq, bk)
    if softclamp is not None:
        s = jnp.tanh(s / softclamp) * softclamp
        deriv = 1.0 - (s / softclamp) ** 2
    else:
        deriv = jnp.ones_like(s)
    p = jnp.exp(s - lse_rows[:, None])
    p = jnp.where(mk[None, :] != 0, p, 0.0)
    return p, deriv


def _flash_bwd_dq_kernel(q_ref, do_ref, k_ref, v_ref, lse_ref, dcap_ref,
                         mask_ref, dq_ref, *, scale: float,
                         softclamp: float | None, block_k: int, heads: int):
    # blocks: q/do/dq (1,1,bq,d); k/v full (1,1,nk,d); lse/dcap full
    # (b*h, nq) — 2D so the trailing dim tiles into VMEM lanes (a trailing
    # size-1 dim would pad to 128 lanes: 25 MB of scoped VMEM for nothing);
    # mask full (b,nk)
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    batch_idx = bh // heads
    bq = q_ref.shape[2]
    nk = k_ref.shape[2]
    num_kb = nk // block_k

    qs = q_ref[0, 0].astype(jnp.float32) * scale         # (bq, d)
    dos = do_ref[0, 0].astype(jnp.float32)
    lse_rows = lse_ref[bh, pl.ds(qi * bq, bq)]
    d_rows = dcap_ref[bh, pl.ds(qi * bq, bq)]

    def body(i, acc):
        ks = k_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        vs = v_ref[0, 0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        mk = mask_ref[batch_idx, pl.ds(i * block_k, block_k)]
        p, deriv = _recompute_p(qs, ks, mk, lse_rows, softclamp)
        dp = _dot(dos, vs, ((1,), (1,)))                 # (bq, bk)
        ds = p * (dp - d_rows[:, None]) * deriv
        return acc + _dot(ds, ks, ((1,), (0,)))          # (bq, d)

    acc0 = jnp.zeros((bq, q_ref.shape[3]), jnp.float32)
    dq = lax.fori_loop(0, num_kb, body, acc0) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dcap_ref,
                          mask_ref, dk_ref, dv_ref, *, scale: float,
                          softclamp: float | None, block_q: int, heads: int):
    # blocks: k/v/dk/dv (1,1,bk,d); q/do full (1,1,nq,d); lse/dcap full
    # (b*h, nq); mask full (b,nk)
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    batch_idx = bh // heads
    bk = k_ref.shape[2]
    nq = q_ref.shape[2]
    num_qb = nq // block_q

    ks = k_ref[0, 0].astype(jnp.float32)                 # (bk, d)
    vs = v_ref[0, 0].astype(jnp.float32)
    mk = mask_ref[batch_idx, pl.ds(ki * bk, bk)]

    def body(i, carry):
        dk_acc, dv_acc = carry
        qs = q_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(
            jnp.float32) * scale                          # (bq, d)
        dos = do_ref[0, 0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse_rows = lse_ref[bh, pl.ds(i * block_q, block_q)]
        d_rows = dcap_ref[bh, pl.ds(i * block_q, block_q)]
        p, deriv = _recompute_p(qs, ks, mk, lse_rows, softclamp)
        dv_acc = dv_acc + _dot(p, dos, ((0,), (0,)))     # (bk, d)
        dp = _dot(dos, vs, ((1,), (1,)))                 # (bq, bk)
        ds = p * (dp - d_rows[:, None]) * deriv
        dk_acc = dk_acc + _dot(ds, qs, ((0,), (0,)))     # (bk, d): ds^T @ qs
        return dk_acc, dv_acc

    z = jnp.zeros((bk, k_ref.shape[3]), jnp.float32)
    dk, dv = lax.fori_loop(0, num_qb, body, (z, z))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


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


def _flash_fwd_lse_impl(q, k, v, mask_arr, softclamp, scale, block_q,
                        block_k, interpret):
    """Forward returning (out, lse (b,h,nq,1)) — the residuals the Pallas
    backward kernels need."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    bq = _pick_block(nq, block_q)
    bk = _pick_block(nk, block_k)
    kernel = functools.partial(
        _flash_kernel_lse, scale=scale, softclamp=softclamp, block_k=bk,
        heads=h)
    blk = lambda bh, qi: (bh // h, bh % h, qi, 0)
    full = lambda bh, qi: (bh // h, bh % h, 0, 0)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32)],
        grid=(b * h, nq // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nk), lambda bh, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, 1, bq, d), blk, memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, bq, 1), blk, memory_space=pltpu.VMEM)],
        interpret=interpret,
    )(q, k, v, mask_arr)


def _flash_bwd_impl(q, k, v, mask_arr, out, lse, g, softclamp, scale,
                    block_q, block_k, interpret):
    """(dq, dk, dv) via the two Pallas backward kernels (FlashAttention
    backward: p recomputed from lse, D = rowsum(dO*O))."""
    b, h, nq, d = q.shape
    nk = k.shape[2]
    # smaller blocks than forward: the backward body holds ~5 (bq, bk) f32
    # temporaries (s, deriv, p, dp, ds) — 768-row blocks exceed the 16 MB
    # scoped-VMEM limit (24 MB). 384 divides the 768-frame serving/training
    # bucket exactly (512 would degrade to 256 via _pick_block) and keeps
    # the stack ~3 MB.
    # V2AP_FLASH_BWD_BQ/BK: retune knobs (scripts/probe_train_step.py sweeps
    # them; 384/384 won the r2 sweep at b4, re-checked at b24 in r4)
    bq = _pick_block(nq, min(block_q,
                             int(os.environ.get("V2AP_FLASH_BWD_BQ", 384))))
    bk = _pick_block(nk, min(block_k,
                             int(os.environ.get("V2AP_FLASH_BWD_BK", 384))))
    dcap = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1)                              # (b, h, nq)
    dcap2 = dcap.reshape(b * h, nq)
    lse2 = lse.reshape(b * h, nq)

    qblk = lambda bh, qi: (bh // h, bh % h, qi, 0)
    kblk = lambda bh, ki: (bh // h, bh % h, ki, 0)
    full4 = lambda bh, i: (bh // h, bh % h, 0, 0)
    mspec = pl.BlockSpec((b, nk), lambda bh, i: (0, 0),
                         memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((b * h, nq), lambda bh, i: (0, 0),
                           memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale,
                          softclamp=softclamp, block_k=bk, heads=h),
        out_shape=jax.ShapeDtypeStruct((b, h, nq, d), q.dtype),
        grid=(b * h, nq // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), qblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, d), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk, d), full4, memory_space=pltpu.VMEM),
            rowspec, rowspec, mspec,
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), qblk, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, g, k, v, lse2, dcap2, mask_arr)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          softclamp=softclamp, block_q=bq, heads=h),
        out_shape=[jax.ShapeDtypeStruct((b, h, nk, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, nk, d), v.dtype)],
        grid=(b * h, nk // bk),
        in_specs=[
            pl.BlockSpec((1, 1, bk, d), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq, d), full4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nq, d), full4, memory_space=pltpu.VMEM),
            rowspec, rowspec, mspec,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), kblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), kblk, memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(k, v, q, g, lse2, dcap2, mask_arr)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash_ad(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
              interpret, bwd_mode):
    return _flash_impl(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                       interpret)


def _flash_ad_fwd(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                  interpret, bwd_mode):
    out, lse = _flash_fwd_lse_impl(q, k, v, mask_arr, softclamp, scale,
                                   block_q, block_k, interpret)
    return out, (q, k, v, mask_arr, out, lse)


def _flash_ad_bwd(softclamp, scale, block_q, block_k, interpret, bwd_mode,
                  res, g):
    q, k, v, mask_arr, out, lse = res
    if bwd_mode == "xla":
        # fallback: recompute with the XLA reference math and take its VJP
        def ref(q_, k_, v_):
            return attention_reference(q_, k_, v_, mask_arr != 0,
                                       softclamp=softclamp, scale=scale)

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    dq, dk, dv = _flash_bwd_impl(q, k, v, mask_arr, out, lse, g, softclamp,
                                 scale, block_q, block_k, interpret)
    return dq, dk, dv, None


_flash_ad.defvjp(_flash_ad_fwd, _flash_ad_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("softclamp", "scale", "block_q", "block_k", "interpret",
                     "bwd_mode"),
)
def _flash_jit(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
               interpret, bwd_mode):
    return _flash_ad(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                     interpret, bwd_mode)


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

    # Read the backward-path selector once per call, outside any trace, and
    # pass it as a static arg so it participates in the jit cache key
    # (flipping the env var after a compile takes effect on the next call).
    bwd_mode = os.environ.get("V2AP_FLASH_BWD", "pallas")
    return _flash_jit(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                      interpret, bwd_mode)


def use_pallas_default() -> bool:
    """Pallas path only on real TPU backends."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# --------------------------------------------------------------------------- #
# Packed-layout kernels: (b, n, h*d), no head transposes
# --------------------------------------------------------------------------- #
# The qkv projections produce (b, n, h*d) and to_out consumes it; the 4D
# kernels above force XLA to materialise (b,n,h,d)<->(b,h,n,d) transposes
# around every attention (the b24 train-step op profile attributes ~90 ms/step
# to them, scripts/xplane_summary.py). These kernels block the natural packed
# array directly — (1, bq, hg*d) q blocks, (1, nk, hg*d) resident K/V — so
# every DMA is contiguous; heads are *static* minor-dim slices unrolled
# ``head_group`` at a time (Mosaic cannot lower interior-singleton reshapes
# or dynamic lane slicing, and a full-h unroll overflows the scoped-VMEM
# stack with the (bq, bk) f32 softmax temporaries).
#
# head_group invariants: hg divides h; hg*d is a multiple of 128 (lane-tile
# rule for non-full block dims). _packed_head_group picks it; callers fall
# back to the 4D path when no valid hg exists (e.g. the d=104 CLIP tower).

def _packed_head_group(heads: int, dim_head: int, nk: int) -> int | None:
    budget = 4 * 1024 * 1024  # resident K+V bytes per program (bf16, x2 arrays)
    for hg in (4, 2):
        if heads % hg == 0 and (hg * dim_head) % 128 == 0 \
                and 2 * nk * hg * dim_head * 2 <= budget:
            return hg
    return None


def _packed_online_softmax(q, k_ref, v_ref, mask_ref, bi, hi, d, block_k,
                           softclamp):
    """Online softmax for head slice ``hi`` of packed K/V refs; q is the
    pre-scaled (bq, d) f32 block. Returns (acc, l, m)."""
    nk = k_ref.shape[1]
    bq = q.shape[0]
    num_kb = nk // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        ks = k_ref[0, pl.ds(i * block_k, block_k), hi * d:(hi + 1) * d]
        vs = v_ref[0, pl.ds(i * block_k, block_k), hi * d:(hi + 1) * d]
        s = _dot(q, ks.astype(jnp.float32), ((1,), (1,)))   # (bq, bk)
        if softclamp is not None:
            s = jnp.tanh(s / softclamp) * softclamp
        mk = mask_ref[bi, pl.ds(i * block_k, block_k)]
        s = jnp.where(mk[None, :] != 0, s, NEG_INF)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + _dot(p, vs.astype(jnp.float32),
                                          ((1,), (0,)))
        return m_cur, l_cur, acc

    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m, l, acc = lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    return acc, l, m


# lse/dcap row tensors ride in (b, h//hg, _LSE_PAD, nq) layout: a (hg, nq)
# block would break the sublane tile rule (second-to-last block dim must be
# a multiple of 8 or the full array dim), so the head rows are padded to 8.
_LSE_PAD = 8


def _packed_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref=None, *,
                       scale, softclamp, block_k, head_group, dim_head):
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    d = dim_head
    bq = q_ref.shape[1]
    outs, lses = [], []
    for hi in range(head_group):
        q = q_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32) * scale
        acc, l, m = _packed_online_softmax(q, k_ref, v_ref, mask_ref, bi, hi,
                                           d, block_k, softclamp)
        outs.append((acc / jnp.maximum(l, 1e-20)[:, None]).astype(o_ref.dtype))
        if lse_ref is not None:
            lses.append(m + jnp.log(jnp.maximum(l, 1e-30)))
    o_ref[0] = jnp.concatenate(outs, axis=-1)           # (bq, hg*d)
    if lse_ref is not None:
        pad = [jnp.zeros_like(lses[0])] * (_LSE_PAD - head_group)
        # resident block (index map constant in qi): partial column store
        lse_ref[0, 0, :, pl.ds(qi * bq, bq)] = jnp.stack(lses + pad, axis=0)


def _packed_bwd_dq_kernel(q_ref, do_ref, k_ref, v_ref, lse_ref, dcap_ref,
                          mask_ref, dq_ref, *, scale, softclamp, block_k,
                          head_group, dim_head):
    # q/do/dq (1, bq, hg*d); k/v (1, nk, hg*d); lse/dcap (1, hg, nq);
    # mask (b, nk)
    bi = pl.program_id(0)
    qi = pl.program_id(2)
    d = dim_head
    bq = q_ref.shape[1]
    nk = k_ref.shape[1]
    num_kb = nk // block_k
    dqs = []
    for hi in range(head_group):
        qs = q_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32) * scale
        dos = do_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32)
        lse_rows = lse_ref[0, 0, hi, pl.ds(qi * bq, bq)]
        d_rows = dcap_ref[0, 0, hi, pl.ds(qi * bq, bq)]

        def body(i, acc):
            ks = k_ref[0, pl.ds(i * block_k, block_k),
                       hi * d:(hi + 1) * d].astype(jnp.float32)
            vs = v_ref[0, pl.ds(i * block_k, block_k),
                       hi * d:(hi + 1) * d].astype(jnp.float32)
            mk = mask_ref[bi, pl.ds(i * block_k, block_k)]
            p, deriv = _recompute_p(qs, ks, mk, lse_rows, softclamp)
            dp = _dot(dos, vs, ((1,), (1,)))
            ds = p * (dp - d_rows[:, None]) * deriv
            return acc + _dot(ds, ks, ((1,), (0,)))

        acc0 = jnp.zeros((bq, d), jnp.float32)
        dq = lax.fori_loop(0, num_kb, body, acc0) * scale
        dqs.append(dq.astype(dq_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)


def _packed_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, dcap_ref,
                           mask_ref, dk_ref, dv_ref, *, scale, softclamp,
                           block_q, head_group, dim_head):
    # k/v/dk/dv (1, bk, hg*d); q/do (1, nq, hg*d); lse/dcap (1, hg, nq)
    bi = pl.program_id(0)
    ki = pl.program_id(2)
    d = dim_head
    bk = k_ref.shape[1]
    nq = q_ref.shape[1]
    num_qb = nq // block_q
    mk = mask_ref[bi, pl.ds(ki * bk, bk)]
    dks, dvs = [], []
    for hi in range(head_group):
        ks = k_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32)
        vs = v_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32)

        def body(i, carry):
            dk_acc, dv_acc = carry
            qs = q_ref[0, pl.ds(i * block_q, block_q),
                       hi * d:(hi + 1) * d].astype(jnp.float32) * scale
            dos = do_ref[0, pl.ds(i * block_q, block_q),
                         hi * d:(hi + 1) * d].astype(jnp.float32)
            lse_rows = lse_ref[0, 0, hi, pl.ds(i * block_q, block_q)]
            d_rows = dcap_ref[0, 0, hi, pl.ds(i * block_q, block_q)]
            p, deriv = _recompute_p(qs, ks, mk, lse_rows, softclamp)
            dv_acc = dv_acc + _dot(p, dos, ((0,), (0,)))
            dp = _dot(dos, vs, ((1,), (1,)))
            ds = p * (dp - d_rows[:, None]) * deriv
            dk_acc = dk_acc + _dot(ds, qs, ((0,), (0,)))
            return dk_acc, dv_acc

        z = jnp.zeros((bk, d), jnp.float32)
        dk, dv = lax.fori_loop(0, num_qb, body, (z, z))
        dks.append(dk.astype(dk_ref.dtype))
        dvs.append(dv.astype(dv_ref.dtype))
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)


def _packed_impl(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                 interpret, heads, dim_head, head_group, with_lse):
    b, nq, hd = q.shape
    nk = k.shape[1]
    hg = head_group
    hgd = hg * dim_head
    bq = _pick_block(nq, block_q)
    bk = _pick_block(nk, block_k)
    grid = (b, heads // hg, nq // bq)
    qblk = pl.BlockSpec((1, bq, hgd), lambda bi, gi, qi: (bi, qi, gi),
                        memory_space=pltpu.VMEM)
    kfull = pl.BlockSpec((1, nk, hgd), lambda bi, gi, qi: (bi, 0, gi),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((b, nk), lambda bi, gi, qi: (0, 0),
                         memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _packed_fwd_kernel, scale=scale, softclamp=softclamp, block_k=bk,
        head_group=hg, dim_head=dim_head)
    out_shapes = [jax.ShapeDtypeStruct((b, nq, hd), q.dtype)]
    out_specs = [qblk]
    if with_lse:
        out_shapes.append(jax.ShapeDtypeStruct(
            (b, heads // hg, _LSE_PAD, nq), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, _LSE_PAD, nq),
                                      lambda bi, gi, qi: (bi, gi, 0, 0),
                                      memory_space=pltpu.VMEM))
    res = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=grid,
        in_specs=[qblk, kfull, kfull, mspec],
        out_specs=out_specs,
        interpret=interpret,
    )(q, k, v, mask_arr)
    return res if with_lse else res[0]


def _packed_bwd_impl(q, k, v, mask_arr, out, lse, g, softclamp, scale,
                     block_q, block_k, interpret, heads, dim_head,
                     head_group):
    b, nq, hd = q.shape
    nk = k.shape[1]
    d = dim_head
    hg = head_group
    hgd = hg * d
    bq = _pick_block(nq, min(block_q,
                             int(os.environ.get("V2AP_FLASH_BWD_BQ", 384))))
    bk = _pick_block(nk, min(block_k,
                             int(os.environ.get("V2AP_FLASH_BWD_BK", 384))))
    # D = rowsum(dO * O) per head, in the padded row layout the kernels read:
    # (b, nq, h, d) view -> (b, h, nq) -> (b, h//hg, _LSE_PAD, nq). Tiny.
    dcap = jnp.sum(g.astype(jnp.float32).reshape(b, nq, heads, d)
                   * out.astype(jnp.float32).reshape(b, nq, heads, d),
                   axis=-1).transpose(0, 2, 1).reshape(b, heads // hg, hg, nq)
    dcap = jnp.pad(dcap, ((0, 0), (0, 0), (0, _LSE_PAD - hg), (0, 0)))
    rowspec = pl.BlockSpec((1, 1, _LSE_PAD, nq),
                           lambda bi, gi, i: (bi, gi, 0, 0),
                           memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((b, nk), lambda bi, gi, i: (0, 0),
                         memory_space=pltpu.VMEM)
    qblk = pl.BlockSpec((1, bq, hgd), lambda bi, gi, qi: (bi, qi, gi),
                        memory_space=pltpu.VMEM)
    kfull = pl.BlockSpec((1, nk, hgd), lambda bi, gi, qi: (bi, 0, gi),
                         memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_packed_bwd_dq_kernel, scale=scale,
                          softclamp=softclamp, block_k=bk, head_group=hg,
                          dim_head=d),
        out_shape=jax.ShapeDtypeStruct((b, nq, hd), q.dtype),
        grid=(b, heads // hg, nq // bq),
        in_specs=[qblk, qblk, kfull, kfull, rowspec, rowspec, mspec],
        out_specs=qblk,
        interpret=interpret,
    )(q, g, k, v, lse, dcap, mask_arr)

    kblk = pl.BlockSpec((1, bk, hgd), lambda bi, gi, ki: (bi, ki, gi),
                        memory_space=pltpu.VMEM)
    qfull = pl.BlockSpec((1, nq, hgd), lambda bi, gi, ki: (bi, 0, gi),
                         memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_packed_bwd_dkv_kernel, scale=scale,
                          softclamp=softclamp, block_q=bq, head_group=hg,
                          dim_head=d),
        out_shape=[jax.ShapeDtypeStruct((b, nk, hd), k.dtype),
                   jax.ShapeDtypeStruct((b, nk, hd), v.dtype)],
        grid=(b, heads // hg, nk // bk),
        in_specs=[kblk, kblk, qfull, qfull, rowspec, rowspec, mspec],
        out_specs=[kblk, kblk],
        interpret=interpret,
    )(k, v, q, g, lse, dcap, mask_arr)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10,
                                                    11, 12))
def _packed_ad(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
               interpret, bwd_mode, heads, dim_head, head_group):
    return _packed_impl(q, k, v, mask_arr, softclamp, scale, block_q,
                        block_k, interpret, heads, dim_head, head_group,
                        with_lse=False)


def _packed_ad_fwd(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                   interpret, bwd_mode, heads, dim_head, head_group):
    out, lse = _packed_impl(q, k, v, mask_arr, softclamp, scale, block_q,
                            block_k, interpret, heads, dim_head, head_group,
                            with_lse=True)
    return out, (q, k, v, mask_arr, out, lse)


def _packed_ad_bwd(softclamp, scale, block_q, block_k, interpret, bwd_mode,
                   heads, dim_head, head_group, res, g):
    q, k, v, mask_arr, out, lse = res
    if bwd_mode == "xla":
        b, nq, hd = q.shape
        d = dim_head
        un = lambda t: t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)

        def ref(q_, k_, v_):
            o = attention_reference(un(q_), un(k_), un(v_), mask_arr != 0,
                                    softclamp=softclamp, scale=scale)
            return o.transpose(0, 2, 1, 3).reshape(b, nq, hd)

        _, vjp = jax.vjp(ref, q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    dq, dk, dv = _packed_bwd_impl(q, k, v, mask_arr, out, lse, g, softclamp,
                                  scale, block_q, block_k, interpret, heads,
                                  dim_head, head_group)
    return dq, dk, dv, None


_packed_ad.defvjp(_packed_ad_fwd, _packed_ad_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("softclamp", "scale", "block_q", "block_k", "interpret",
                     "bwd_mode", "heads", "dim_head", "head_group"),
)
def _packed_jit(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                interpret, bwd_mode, heads, dim_head, head_group):
    return _packed_ad(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                      interpret, bwd_mode, heads, dim_head, head_group)


def flash_attention_packed(
    q: jnp.ndarray,                      # (b, nq, h*d) packed heads
    k: jnp.ndarray,                      # (b, nk, h*d)
    v: jnp.ndarray,                      # (b, nk, h*d)
    kv_mask: jnp.ndarray | None = None,  # (b, nk)
    *,
    heads: int,
    dim_head: int,
    softclamp: float | None = None,
    scale: float | None = None,
    block_q: int = 768,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Transpose-free flash attention on head-packed (b, n, h*d) arrays.

    Callers must check :func:`packed_eligible` first (it returns the
    head_group, or None when the shape cannot take this path).
    """
    b, nq, hd = q.shape
    nk = k.shape[1]
    scale = scale if scale is not None else dim_head ** -0.5
    hg = _packed_head_group(heads, dim_head, nk)
    assert hg is not None, "caller must gate on packed_eligible()"
    mask_arr = (jnp.ones((b, nk), jnp.int32) if kv_mask is None
                else kv_mask.astype(jnp.int32))
    bwd_mode = os.environ.get("V2AP_FLASH_BWD", "pallas")
    return _packed_jit(q, k, v, mask_arr, softclamp, scale, block_q, block_k,
                       interpret, bwd_mode, heads, dim_head, hg)


def packed_eligible(heads: int, dim_head: int, nq: int, nk: int) -> bool:
    """True when the packed kernels can run: 128-multiple seq lengths (same
    rule as the 4D path) and a valid head_group exists."""
    return (nq % 128 == 0 and nk % 128 == 0
            and _packed_head_group(heads, dim_head, nk) is not None)

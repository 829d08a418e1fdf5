#!/usr/bin/env python
"""Prototype probe: flash attention operating directly on (b, n, h, d)
("BNHD") vs the shipped transpose + (b, h, n, d) kernel.

The b24 train-step op profile (scripts/xplane_summary.py) shows ~90 ms/step
of attention layout transposes/copies: the qkv projection produces
(b, n, h*d) and the Pallas kernel demands head-contiguous (b, h, n, d), so
XLA materialises transposes around every attention (and their grads). A
kernel whose blocks are (1, bq, HG, d) over the natural (b, n, h, d) array
needs NO transposes and its DMAs stay fully contiguous; heads are a static
unroll inside the program.

    python scripts/probe_flash_bnhd.py [--batch 24] [--seq 768]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from v2ap_tpu.ops.flash_attention import (
    NEG_INF, attention_reference, flash_attention)
from v2ap_tpu.ops.rope import apply_rope


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _bnhd_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                     scale: float, softclamp: float | None, block_k: int,
                     head_group: int, dim_head: int):
    # 3D blocks over (b, n, h*d): q_ref (1, bq, hg*d); k/v (1, nk, hg*d);
    # mask (b, nk). Heads are static minor-dim slices.
    bi = pl.program_id(0)
    d = dim_head
    nk = k_ref.shape[1]
    bq = q_ref.shape[1]
    num_kb = nk // block_k
    outs = []
    for hi in range(head_group):                      # static unroll
        q = q_ref[0, :, hi * d:(hi + 1) * d].astype(jnp.float32) * scale

        def body(i, carry):
            m_prev, l_prev, acc = carry
            ks = k_ref[0, pl.ds(i * block_k, block_k), hi * d:(hi + 1) * d]
            vs = v_ref[0, pl.ds(i * block_k, block_k), hi * d:(hi + 1) * d]
            s = _dot(q, ks.astype(jnp.float32), ((1,), (1,)))
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
        _, l, acc = lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
        outs.append((acc / jnp.maximum(l, 1e-20)[:, None]
                     ).astype(o_ref.dtype))
    # minor-dim concat: supported by Mosaic (interior-singleton reshapes
    # and per-head strided stores are not)
    o_ref[0] = jnp.concatenate(outs, axis=-1)         # (bq, hg*d)


def flash_bnhd(q, k, v, kv_mask, *, softclamp=None, scale=None,
               block_q=768, block_k=768, head_group=None, heads=None,
               dim_head=64):
    # q/k/v: (b, n, h*d) packed heads
    b, nq, hd = q.shape
    h = heads or hd // dim_head
    d = dim_head
    nk = k.shape[1]
    scale = scale if scale is not None else d ** -0.5
    hg = head_group or h
    assert h % hg == 0
    bq = min(block_q, nq)
    while nq % bq:
        bq //= 2
    bk = min(block_k, nk)
    while nk % bk:
        bk //= 2
    mask_arr = (jnp.ones((b, nk), jnp.int32) if kv_mask is None
                else kv_mask.astype(jnp.int32))
    grid = (b, h // hg, nq // bq)
    kernel = functools.partial(_bnhd_fwd_kernel, scale=scale,
                               softclamp=softclamp, block_k=bk,
                               head_group=hg, dim_head=d)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, nq, h * d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hg * d), lambda bi, gi, qi: (bi, qi, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hg * d), lambda bi, gi, qi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, hg * d), lambda bi, gi, qi: (bi, 0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, nk), lambda bi, gi, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hg * d),
                               lambda bi, gi, qi: (bi, qi, gi),
                               memory_space=pltpu.VMEM),
    )(q, k, v, mask_arr)


# --------------------------------------------------------------------- timing
def bench(fn, args, reps=20):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0][0, 0])   # force (axon-safe)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0][:1, :1])
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    return float(np.median(ts)), float(ts.min()), float(ts.max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--seq", type=int, default=768)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim-head", type=int, default=64)
    ap.add_argument("--head-group", type=int, default=0)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    b, n, h, d = args.batch, args.seq, args.heads, args.dim_head
    hg = args.head_group or h

    rng = np.random.default_rng(0)
    # simulate the real producer/consumer: fused qkv output (b, n, 3*h*d)
    qkv = jnp.asarray(rng.normal(size=(b, n, 3 * h * d)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    mask = jnp.ones((b, n), bool)
    rot = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))

    @jax.jit
    def old_path(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sp = lambda t: t.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        q, k, v = sp(q), sp(k), sp(v)
        q = apply_rope(q, rot)
        k = apply_rope(k, rot)
        o = flash_attention(q, k, v, mask, softclamp=50.0)
        return o.transpose(0, 2, 1, 3).reshape(b, n, h * d)

    @jax.jit
    def new_path(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sp = lambda t: t.reshape(b, n, h, d)
        q = apply_rope(sp(q), rot, seq_axis=1).reshape(b, n, h * d)
        k = apply_rope(sp(k), rot, seq_axis=1).reshape(b, n, h * d)
        o = flash_bnhd(q, k, v, mask, softclamp=50.0, head_group=hg,
                       heads=h, dim_head=d)
        return o

    o_old = np.asarray(old_path(qkv), np.float32)
    o_new = np.asarray(new_path(qkv), np.float32)
    rel = np.sqrt(((o_old - o_new) ** 2).mean()) / (np.sqrt(
        (o_old ** 2).mean()) + 1e-9)
    print(f"parity old vs new rel-rms: {rel:.2e}")

    for name, fn in (("old bhnd+transposes", old_path),
                     ("new bnhd hg=%d" % hg, new_path)):
        med, lo, hi = bench(fn, (qkv,), args.reps)
        print(f"{name:24s} {med:8.3f} ms  [{lo:.3f}, {hi:.3f}]")


if __name__ == "__main__":
    main()

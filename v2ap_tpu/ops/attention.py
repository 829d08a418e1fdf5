"""Multi-head attention with per-head value gating and logit soft-clamping.

Math parity with the x_transformers ``Attention(gate_value_heads=True,
softclamp_logits=True)`` used throughout the reference transformer
(e2_tts_crossatt3.py:729-732,808): q/k/v/out projections without bias,
rotary on q & k for self-attention only, softclamped logits, key-padding
mask, sigmoid per-head output gates computed from the *query* input.

One deliberate TRAINING-time deviation: x_transformers drops post-softmax
attention *probabilities* (Attend.attn_dropout); here dropout applies to
the attention *output* rows instead. Per-row expected scaling is identical
and inference (deterministic=True) is exactly equivalent — but in-kernel
probability dropout would forbid the online-softmax flash kernels (the
full (nq, nk) matrix never materialises), and regularizing rows vs edges
is an accepted equivalent (the reference never shipped a checkpoint whose
quality depends on the distinction; both zero an unbiased 10%).

The inner softmax-attention runs through the Pallas flash kernel on TPU
(`ops.flash_attention`) and the XLA reference path elsewhere.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx

from v2ap_tpu.ops.flash_attention import (
    attention_reference,
    flash_attention,
    flash_attention_packed,
    packed_eligible,
    use_pallas_default,
)
from v2ap_tpu.ops.rope import apply_rope


class Attention(nnx.Module):
    def __init__(
        self,
        dim: int,
        heads: int,
        dim_head: int,
        *,
        dim_context: int | None = None,
        cross_attention: bool | None = None,
        dropout: float = 0.0,
        gate_value_heads: bool = True,
        softclamp_logits: bool = True,
        softclamp_value: float = 50.0,
        dtype=jnp.float32,
        use_pallas: bool | None = None,
        rngs: nnx.Rngs,
    ):
        inner = heads * dim_head
        dim_context = dim_context or dim
        self.heads = heads
        self.dim_head = dim_head
        self.softclamp = softclamp_value if softclamp_logits else None
        self.use_pallas = use_pallas

        kw = dict(use_bias=False, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        # self-attention fuses q/k/v into ONE matmul (one big MXU op instead
        # of three smaller ones); cross-attention keeps split projections
        # (different input operands)
        if cross_attention is None:
            cross_attention = dim_context != dim
        self.fused_qkv = not cross_attention
        if self.fused_qkv:
            self.to_qkv = nnx.Linear(dim, 3 * inner, **kw)
            self.to_q = self.to_k = self.to_v = None
        else:
            self.to_q = nnx.Linear(dim, inner, **kw)
            self.to_k = nnx.Linear(dim_context, inner, **kw)
            self.to_v = nnx.Linear(dim_context, inner, **kw)
        self.to_out = nnx.Linear(inner, dim, **kw)
        self.to_v_gates = (
            nnx.Linear(dim, heads, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
            if gate_value_heads else None
        )
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, _ = x.shape
        return x.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

    def __call__(
        self,
        x: jnp.ndarray,                     # (b, n, dim)
        *,
        rotary: jnp.ndarray | None = None,  # rope table (>= n, dim_head)
        mask: jnp.ndarray | None = None,    # (b, n) key-padding (self-attn)
        context: jnp.ndarray | None = None,       # (b, nc, dim_context)
        context_mask: jnp.ndarray | None = None,  # (b, nc)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        has_context = context is not None
        kv_input = context if has_context else x

        if self.fused_qkv and not has_context:
            qkv = self.to_qkv(x)
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)       # (b, n, h*d) packed
        else:
            assert not self.fused_qkv, \
                "cross-attention requires dim_context-separate projections"
            qp = self.to_q(x)
            kp = self.to_k(kv_input)
            vp = self.to_v(kv_input)

        kv_mask = context_mask if has_context else mask
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        nk = kp.shape[1]

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = use_pallas_default()

        if use_pallas and packed_eligible(h, d, n, nk):
            # transpose-free path: the Pallas kernels block the head-packed
            # (b, n, h*d) projections directly — no (b,h,n,d) materialisation
            # (the b24 train profile attributed ~90 ms/step to those layout
            # transposes; see flash_attention.py packed-kernel notes)
            if rotary is not None and not has_context:
                qp = apply_rope(qp.reshape(b, n, h, d), rotary,
                                seq_axis=1).reshape(b, n, h * d)
                kp = apply_rope(kp.reshape(b, nk, h, d), rotary,
                                seq_axis=1).reshape(b, nk, h * d)
            out = flash_attention_packed(qp, kp, vp, kv_mask, heads=h,
                                         dim_head=d, softclamp=self.softclamp)
            out = self.dropout(out, deterministic=deterministic)
            if self.to_v_gates is not None:
                gates = nnx.sigmoid(self.to_v_gates(x))      # (b, n, heads)
                out = (out.reshape(b, n, h, d) * gates[..., None]
                       ).reshape(b, n, h * d)
            return self.to_out(out)

        # head-transposed path: CPU/reference oracle and shapes the packed
        # kernels cannot take (unaligned lengths, head_group-less configs)
        q, k, v = (self._split(t) for t in (qp, kp, vp))
        if rotary is not None and not has_context:
            q = apply_rope(q, rotary)
            k = apply_rope(k, rotary)

        # flash kernel needs 128-multiple K length; fall back otherwise
        if use_pallas and k.shape[2] % 128 == 0 and q.shape[2] % 128 == 0:
            out = flash_attention(q, k, v, kv_mask, softclamp=self.softclamp)
        else:
            out = attention_reference(q, k, v, kv_mask, softclamp=self.softclamp)

        out = self.dropout(out, deterministic=deterministic)

        if self.to_v_gates is not None:
            gates = nnx.sigmoid(self.to_v_gates(x))          # (b, n, heads)
            out = out * gates.transpose(0, 2, 1)[..., None]

        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out(out)

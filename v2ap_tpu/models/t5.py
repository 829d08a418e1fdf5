"""T5 text encoder in JAX (FLAN-T5 family, encoder-only).

The reference consumes frozen FLAN-T5-large hidden states as the prompt
cross-attention context (reference: e2_tts_crossatt3.py:1411-1416,1648-1657).
This is a from-scratch JAX encoder with T5's specifics: RMSNorm without
centering, relative-position-bucket attention bias shared from layer 0,
unscaled dot-product attention, and gated-GELU feedforward (FLAN variants).

Weights convert from the HF torch checkpoint once via
`utils.torch_convert.load_t5_from_torch` (tested for parity against a
random-init HF T5EncoderModel). Tokenization stays host-side through HF
``AutoTokenizer`` (pure python/sentencepiece, no torch).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32_128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    gated_act: bool = True          # FLAN: gelu-gated; classic t5: relu non-gated
    dtype: str = "bfloat16"


def flan_t5_large() -> T5Config:
    return T5Config()


def t5_tiny_test() -> T5Config:
    return T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
                    num_heads=4, dtype="float32")


class T5LayerNorm(nnx.Module):
    """RMS-only layer norm (no mean subtraction, no bias)."""

    def __init__(self, dim: int, eps: float, *, rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((dim,), jnp.float32))
        self.eps = eps

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        return (x * self.weight[...]).astype(dtype)


def relative_position_bucket(rel_pos: np.ndarray, num_buckets: int,
                             max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucket scheme (host-side, static per seq length)."""
    ret = np.zeros_like(rel_pos)
    n = num_buckets // 2
    ret += (rel_pos > 0).astype(np.int64) * n
    rel = np.abs(rel_pos)
    max_exact = n // 2
    is_small = rel < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact) / np.log(max_distance / max_exact)
        * (n - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, n - 1)
    ret += np.where(is_small, rel, val_if_large)
    return ret


class T5Attention(nnx.Module):
    def __init__(self, cfg: T5Config, has_bias: bool, *, dtype, rngs: nnx.Rngs):
        inner = cfg.num_heads * cfg.d_kv
        kw = dict(use_bias=False, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.q = nnx.Linear(cfg.d_model, inner, **kw)
        self.k = nnx.Linear(cfg.d_model, inner, **kw)
        self.v = nnx.Linear(cfg.d_model, inner, **kw)
        self.o = nnx.Linear(inner, cfg.d_model, **kw)
        self.heads = cfg.num_heads
        self.d_kv = cfg.d_kv
        self.rel_bias = (
            nnx.Embed(cfg.relative_attention_num_buckets, cfg.num_heads,
                      param_dtype=jnp.float32, dtype=jnp.float32, rngs=rngs)
            if has_bias else None)

    def __call__(self, x, mask, pos_bias):
        b, n, _ = x.shape
        split = lambda t: t.reshape(b, n, self.heads, self.d_kv).transpose(0, 2, 1, 3)
        q, k, v = split(self.q(x)), split(self.k(x)), split(self.v(x))
        # T5: no 1/sqrt(d) scaling
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32))
        s = s + pos_bias
        if mask is not None:
            s = jnp.where(mask[:, None, None, :], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, -1)
        return self.o(out)


class T5FF(nnx.Module):
    def __init__(self, cfg: T5Config, *, dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.gated = cfg.gated_act
        if cfg.gated_act:
            self.wi_0 = nnx.Linear(cfg.d_model, cfg.d_ff, **kw)
            self.wi_1 = nnx.Linear(cfg.d_model, cfg.d_ff, **kw)
        else:
            self.wi = nnx.Linear(cfg.d_model, cfg.d_ff, **kw)
        self.wo = nnx.Linear(cfg.d_ff, cfg.d_model, **kw)

    def __call__(self, x):
        if self.gated:
            h = nnx.gelu(self.wi_0(x), approximate=True) * self.wi_1(x)
        else:
            h = nnx.relu(self.wi(x))
        return self.wo(h)


class T5Block(nnx.Module):
    def __init__(self, cfg: T5Config, has_bias: bool, *, dtype, rngs: nnx.Rngs):
        self.ln1 = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, rngs=rngs)
        self.attn = T5Attention(cfg, has_bias, dtype=dtype, rngs=rngs)
        self.ln2 = T5LayerNorm(cfg.d_model, cfg.layer_norm_epsilon, rngs=rngs)
        self.ff = T5FF(cfg, dtype=dtype, rngs=rngs)

    def __call__(self, x, mask, pos_bias):
        x = x + self.attn(self.ln1(x), mask, pos_bias)
        x = x + self.ff(self.ln2(x))
        return x


class T5Encoder(nnx.Module):
    def __init__(self, cfg: T5Config | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or flan_t5_large()
        dtype = jnp.dtype(self.cfg.dtype)
        self.dtype = dtype
        self.embed = nnx.Embed(self.cfg.vocab_size, self.cfg.d_model,
                               param_dtype=jnp.float32, dtype=dtype, rngs=rngs)
        self.blocks = nnx.List(
            [T5Block(self.cfg, has_bias=(i == 0), dtype=dtype, rngs=rngs)
             for i in range(self.cfg.num_layers)])
        self.final_ln = T5LayerNorm(self.cfg.d_model,
                                    self.cfg.layer_norm_epsilon, rngs=rngs)

    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray | None = None) -> jnp.ndarray:
        """(b, n) token ids -> (b, n, d_model) hidden states."""
        n = input_ids.shape[1]
        pos = np.arange(n)
        rel = pos[None, :] - pos[:, None]                  # key - query? see below
        # HF computes memory_position - query_position
        buckets = relative_position_bucket(
            rel, self.cfg.relative_attention_num_buckets,
            self.cfg.relative_attention_max_distance)
        bias_emb = self.blocks[0].attn.rel_bias(jnp.asarray(buckets))
        pos_bias = bias_emb.transpose(2, 0, 1)[None]       # (1, h, n, n) f32

        x = self.embed(input_ids)
        mask = attention_mask.astype(bool) if attention_mask is not None else None
        for blk in self.blocks:
            x = blk(x, mask, pos_bias)
        x = self.final_ln(x)
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        return x

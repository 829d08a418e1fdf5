"""Duration predictor: text -> predicted latent-frame count.

Reference: ``DurationPredictor`` (e2_tts_crossatt3.py:1147-1273) — a
time-unconditioned transformer over (projected latents + character
embeddings) with masked mean pooling and a softplus scalar head, trained
with MSE against true lengths and a random prefix mask. Unused by the
shipped inference configs (duration comes from the video length), but part
of the public model family.

Here it reuses the tri-stream backbone with the frames stream fed zeros and
time conditioning disabled via a constant time embedding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from v2ap_tpu.config import ModelConfig
from v2ap_tpu.models.transformer import TriStreamTransformer
from v2ap_tpu.ops import lens_to_mask


class CharacterEmbed(nnx.Module):
    """Token ids -> (b, n, dim_text), padded/curtailed to the latent length;
    id -1 is padding (shifted up by one onto a zero 'filler' row)."""

    def __init__(self, dim_text: int, num_embeds: int = 256, *,
                 rngs: nnx.Rngs):
        self.embed = nnx.Embed(num_embeds + 1, dim_text,
                               param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, tokens: jnp.ndarray, length: int) -> jnp.ndarray:
        tokens = tokens + 1
        b, nt = tokens.shape
        if nt >= length:
            tokens = tokens[:, :length]
        else:
            tokens = jnp.pad(tokens, ((0, 0), (0, length - nt)))
        return self.embed(tokens)


class DurationPredictor(nnx.Module):
    def __init__(self, cfg: ModelConfig, text_num_embeds: int = 256, *,
                 rngs: nnx.Rngs):
        self.cfg = cfg
        self.transformer = TriStreamTransformer(cfg, rngs=rngs)
        dtype = jnp.dtype(cfg.dtype)
        self.proj_in = nnx.Linear(cfg.num_channels, cfg.dim, dtype=dtype,
                                  param_dtype=jnp.float32, rngs=rngs)
        self.embed_text = CharacterEmbed(cfg.dim_text, text_num_embeds,
                                         rngs=rngs)
        self.to_pred = nnx.Linear(cfg.dim, 1, use_bias=False, dtype=dtype,
                                  param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, latents: jnp.ndarray, tokens: Optional[jnp.ndarray],
                 lens: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """-> predicted durations (b,) in latent frames."""
        b, n, _ = latents.shape
        x = self.proj_in(latents)
        text_embed = (self.embed_text(tokens, n) if tokens is not None
                      else jnp.zeros((b, n, self.cfg.dim_text), x.dtype))
        frames = jnp.zeros((b, n, self.cfg.dim_frames), x.dtype)
        mask = lens_to_mask(lens, n) if lens is not None else jnp.ones((b, n),
                                                                       bool)
        out = self.transformer(
            x, times=jnp.zeros((b,), jnp.float32), mask=mask,
            text_embed=text_embed, frames_embed=frames)
        out = jnp.where(mask[..., None], out.astype(jnp.float32), 0.0)
        pooled = out.sum(axis=1) / jnp.maximum(
            mask.sum(axis=1, keepdims=True), 1.0)
        return jax.nn.softplus(self.to_pred(pooled)[:, 0].astype(jnp.float32))

    def loss(self, latents: jnp.ndarray, tokens: Optional[jnp.ndarray],
             lens: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """Random-prefix masked MSE against true lengths (reference
        :1247-1273)."""
        b, n, _ = latents.shape
        frac = jax.random.uniform(rng, (b,))
        cut = (frac * lens).astype(jnp.int32)
        mask = lens_to_mask(lens, n) & (jnp.arange(n)[None, :] < cut[:, None])
        x = self.proj_in(latents)
        text_embed = (self.embed_text(tokens, n) if tokens is not None
                      else jnp.zeros((b, n, self.cfg.dim_text), x.dtype))
        frames = jnp.zeros((b, n, self.cfg.dim_frames), x.dtype)
        out = self.transformer(
            x, times=jnp.zeros((b,), jnp.float32), mask=mask,
            text_embed=text_embed, frames_embed=frames)
        out = jnp.where(mask[..., None], out.astype(jnp.float32), 0.0)
        pooled = out.sum(axis=1) / jnp.maximum(
            mask.sum(axis=1, keepdims=True), 1.0)
        pred = jax.nn.softplus(self.to_pred(pooled)[:, 0].astype(jnp.float32))
        return jnp.mean((pred - lens.astype(jnp.float32)) ** 2)


class InterpolatedCharacterEmbed(nnx.Module):
    """Token embeddings linearly interpolated to the latent length, plus an
    absolute-position MLP (reference InterpolatedCharacterEmbed,
    e2_tts_crossatt3.py:592-660). Static-shape formulation: padded token rows
    interpolate by a gather/lerp over fractional source positions; the
    per-row valid token count drives the stretch factor."""

    def __init__(self, dim_text: int, num_embeds: int = 256, *,
                 rngs: nnx.Rngs):
        self.embed = nnx.Embed(num_embeds, dim_text, param_dtype=jnp.float32,
                               rngs=rngs)
        self.pos_fc1 = nnx.Linear(1, dim_text, param_dtype=jnp.float32,
                                  rngs=rngs)
        self.pos_fc2 = nnx.Linear(dim_text, dim_text, param_dtype=jnp.float32,
                                  rngs=rngs)

    def __call__(self, tokens: jnp.ndarray, length: int,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """tokens (b, nt) with -1 padding -> (b, length, dim_text)."""
        b, nt = tokens.shape
        valid = tokens >= 0
        counts = jnp.maximum(valid.sum(axis=1), 1)            # (b,)
        emb = self.embed(jnp.maximum(tokens, 0))              # (b, nt, d)
        emb = jnp.where(valid[..., None], emb, 0.0)

        audio_len = (mask.sum(axis=1) if mask is not None
                     else jnp.full((b,), length))
        # fractional source position per output row (bilinear interp)
        out_idx = jnp.arange(length)[None, :].astype(jnp.float32)  # (1, L)
        denom = jnp.maximum(audio_len[:, None].astype(jnp.float32) - 1.0, 1.0)
        src = out_idx / denom * (counts[:, None].astype(jnp.float32) - 1.0)
        src = jnp.clip(src, 0.0, (counts[:, None] - 1).astype(jnp.float32))
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, counts[:, None] - 1)
        frac = (src - lo)[..., None]
        gather = jax.vmap(lambda e, i: e[i])
        interp = gather(emb, lo) * (1 - frac) + gather(emb, hi) * frac

        abs_pos = out_idx / denom * counts[:, None].astype(jnp.float32)
        pos = self.pos_fc2(nnx.silu(self.pos_fc1(abs_pos[..., None])))
        out = interp + pos
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out

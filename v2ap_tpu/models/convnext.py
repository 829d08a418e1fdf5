"""ConvNeXt-XXLarge CLIP image tower in JAX (the reference's
``video_encoder="clip_convnext"``).

The reference loads open_clip's
``CLIP-convnext_xxlarge-laion2B-s34B-b82K-augreg-soup`` and calls
``encode_image`` for a 1024-d per-frame embedding
(reference: e2_tts_crossatt3.py:1429-1430,1739-1741). Structure re-built
NHWC/TPU-first:

  stem 4x4/4 conv + LN -> 4 stages of ConvNeXt blocks (7x7 depthwise conv,
  LN, pointwise 4x MLP with GELU, LayerScale) with 2x2/2 LN+conv downsampling
  between stages -> global average pool -> LN (the timm trunk head norm) ->
  MLP projection head (open_clip ``timm_proj='mlp'``: hidden = 2 x embed_dim).

Backbone math is parity-tested against HF ``ConvNextModel`` (same block
semantics as the timm trunk); the head follows open_clip's TimmModel wiring.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass(frozen=True)
class ConvNextConfig:
    depths: Tuple[int, ...] = (3, 4, 30, 3)
    hidden_sizes: Tuple[int, ...] = (384, 768, 1536, 3072)   # xxlarge
    image_size: int = 256
    embed_dim: int = 1024            # CLIP projection width
    layer_scale_init: float = 1e-6
    layer_norm_eps: float = 1e-6
    dtype: str = "bfloat16"


def convnext_xxlarge() -> ConvNextConfig:
    return ConvNextConfig()


def convnext_tiny_test() -> ConvNextConfig:
    return ConvNextConfig(depths=(1, 1, 2, 1), hidden_sizes=(8, 16, 32, 64),
                          image_size=32, embed_dim=24, dtype="float32")


class ConvNextBlock(nnx.Module):
    def __init__(self, dim: int, cfg: ConvNextConfig, *, dtype,
                 rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.dwconv = nnx.Conv(dim, dim, (7, 7), padding=((3, 3), (3, 3)),
                               feature_group_count=dim, **kw)
        self.norm = nnx.LayerNorm(dim, epsilon=cfg.layer_norm_eps,
                                  param_dtype=jnp.float32, dtype=jnp.float32,
                                  rngs=rngs)
        self.pwconv1 = nnx.Linear(dim, 4 * dim, **kw)
        self.pwconv2 = nnx.Linear(4 * dim, dim, **kw)
        self.scale = nnx.Param(
            jnp.full((dim,), cfg.layer_scale_init, jnp.float32))

    def __call__(self, x):                      # (b, h, w, c) NHWC throughout
        h = self.dwconv(x)
        h = self.norm(h).astype(x.dtype)
        h = self.pwconv2(nnx.gelu(self.pwconv1(h), approximate=False))
        return x + h * self.scale[...].astype(x.dtype)


class ConvNextDownsample(nnx.Module):
    def __init__(self, cin: int, cout: int, cfg: ConvNextConfig, *, dtype,
                 rngs: nnx.Rngs):
        self.norm = nnx.LayerNorm(cin, epsilon=cfg.layer_norm_eps,
                                  param_dtype=jnp.float32, dtype=jnp.float32,
                                  rngs=rngs)
        self.conv = nnx.Conv(cin, cout, (2, 2), strides=(2, 2),
                             padding="VALID", dtype=dtype,
                             param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        return self.conv(self.norm(x).astype(x.dtype))


class ConvNextCLIP(nnx.Module):
    """pixel_values (b, H, W, 3) -> image embedding (b, embed_dim)."""

    def __init__(self, cfg: ConvNextConfig | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or convnext_xxlarge()
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype
        dims = cfg.hidden_sizes

        self.stem_conv = nnx.Conv(3, dims[0], (4, 4), strides=(4, 4),
                                  padding="VALID", dtype=dtype,
                                  param_dtype=jnp.float32, rngs=rngs)
        ln_kw = dict(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                     dtype=jnp.float32, rngs=rngs)
        self.stem_norm = nnx.LayerNorm(dims[0], **ln_kw)
        self.downsamples = nnx.List([
            ConvNextDownsample(dims[i], dims[i + 1], cfg, dtype=dtype,
                               rngs=rngs) for i in range(3)])
        self.stages = nnx.List([
            nnx.List([ConvNextBlock(dims[s], cfg, dtype=dtype, rngs=rngs)
                      for _ in range(cfg.depths[s])])
            for s in range(4)])
        # trunk head norm (timm: pool -> LN), then the open_clip MLP proj
        self.head_norm = nnx.LayerNorm(dims[-1], **ln_kw)
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.head_fc1 = nnx.Linear(dims[-1], 2 * cfg.embed_dim, **kw)
        self.head_fc2 = nnx.Linear(2 * cfg.embed_dim, cfg.embed_dim, **kw)

    def backbone(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        x = self.stem_norm(
            self.stem_conv(pixel_values.astype(self.dtype))).astype(self.dtype)
        for s in range(4):
            if s > 0:
                x = self.downsamples[s - 1](x)
            for blk in self.stages[s]:
                x = blk(x)
        return x                                  # (b, h', w', dims[-1])

    def pooled(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """Global-avg-pooled, layer-normed trunk features (b, dims[-1]) —
        equals HF ``ConvNextModel().pooler_output``."""
        x = self.backbone(pixel_values)
        return self.head_norm(jnp.mean(x, axis=(1, 2))).astype(jnp.float32)

    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        pooled = self.pooled(pixel_values).astype(self.dtype)
        h = nnx.gelu(self.head_fc1(pooled), approximate=False)
        return self.head_fc2(h).astype(jnp.float32)

"""DINOv2 vision tower in JAX (the reference's ``video_encoder="dinov2"``).

The reference loads HF ``facebook/dinov2-giant`` and uses ``pooler_output``
(the layer-normed CLS token) as the per-frame embedding
(reference: e2_tts_crossatt3.py:1431-1433,1742-1744). This is a from-scratch
JAX ViT with the DINOv2 specifics: biased conv patch embed, CLS token,
learned position embeddings, pre-LN blocks with LayerScale on both residual
branches, and (for the giant variant) the SwiGLU feed-forward with the
2/3-rounded-to-8 hidden width.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass(frozen=True)
class Dinov2Config:
    hidden_size: int = 1536
    num_layers: int = 40
    num_heads: int = 24
    mlp_ratio: float = 4.0
    use_swiglu_ffn: bool = True        # giant uses SwiGLU; base/large use MLP
    image_size: int = 224              # serving crop (pos-embed interpolated
    patch_size: int = 14               #  from 518 at weight-conversion time)
    layerscale_value: float = 1.0
    layer_norm_eps: float = 1e-6
    dtype: str = "bfloat16"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def swiglu_hidden(self) -> int:
        """HF Dinov2SwiGLUFFN: int(ratio*d * 2/3) rounded up to a multiple
        of 8."""
        hidden = int(self.hidden_size * self.mlp_ratio)
        return (int(hidden * 2 / 3) + 7) // 8 * 8


def dinov2_giant() -> Dinov2Config:
    return Dinov2Config()


def dinov2_tiny_test() -> Dinov2Config:
    return Dinov2Config(hidden_size=32, num_layers=2, num_heads=4,
                        image_size=28, patch_size=14, dtype="float32")


class Dinov2SwiGLU(nnx.Module):
    def __init__(self, cfg: Dinov2Config, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        h = cfg.swiglu_hidden
        self.weights_in = nnx.Linear(cfg.hidden_size, 2 * h, **kw)
        self.weights_out = nnx.Linear(h, cfg.hidden_size, **kw)

    def __call__(self, x):
        x1, x2 = jnp.split(self.weights_in(x), 2, axis=-1)
        return self.weights_out(nnx.silu(x1) * x2)


class Dinov2MLP(nnx.Module):
    def __init__(self, cfg: Dinov2Config, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        h = int(cfg.hidden_size * cfg.mlp_ratio)
        self.fc1 = nnx.Linear(cfg.hidden_size, h, **kw)
        self.fc2 = nnx.Linear(h, cfg.hidden_size, **kw)

    def __call__(self, x):
        return self.fc2(nnx.gelu(self.fc1(x), approximate=False))


class Dinov2Attention(nnx.Module):
    def __init__(self, cfg: Dinov2Config, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        d = cfg.hidden_size
        self.q = nnx.Linear(d, d, **kw)
        self.k = nnx.Linear(d, d, **kw)
        self.v = nnx.Linear(d, d, **kw)
        self.o = nnx.Linear(d, d, **kw)
        self.heads = cfg.num_heads
        self.dh = d // cfg.num_heads

    def __call__(self, x):
        b, n, d = x.shape
        split = lambda t: t.reshape(b, n, self.heads, self.dh
                                    ).transpose(0, 2, 1, 3)
        q, k, v = split(self.q(x)), split(self.k(x)), split(self.v(x))
        # bf16 matmul inputs (full-rate MXU), f32 accumulation + softmax
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (self.dh ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(x.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
        return self.o(out)


class Dinov2Block(nnx.Module):
    def __init__(self, cfg: Dinov2Config, *, dtype, rngs: nnx.Rngs):
        ln_kw = dict(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                     dtype=jnp.float32, rngs=rngs)
        self.norm1 = nnx.LayerNorm(cfg.hidden_size, **ln_kw)
        self.attn = Dinov2Attention(cfg, dtype=dtype, rngs=rngs)
        self.scale1 = nnx.Param(
            jnp.full((cfg.hidden_size,), cfg.layerscale_value, jnp.float32))
        self.norm2 = nnx.LayerNorm(cfg.hidden_size, **ln_kw)
        self.mlp = (Dinov2SwiGLU(cfg, dtype=dtype, rngs=rngs)
                    if cfg.use_swiglu_ffn
                    else Dinov2MLP(cfg, dtype=dtype, rngs=rngs))
        self.scale2 = nnx.Param(
            jnp.full((cfg.hidden_size,), cfg.layerscale_value, jnp.float32))

    def __call__(self, x):
        h = self.attn(self.norm1(x).astype(x.dtype))
        x = x + h * self.scale1[...].astype(x.dtype)
        h = self.mlp(self.norm2(x).astype(x.dtype))
        return x + h * self.scale2[...].astype(x.dtype)


class Dinov2Model(nnx.Module):
    """pixel_values (b, H, W, 3) -> pooler_output (b, hidden_size): the
    layer-normed CLS token, matching HF ``Dinov2Model().pooler_output``."""

    def __init__(self, cfg: Dinov2Config | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or dinov2_giant()
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype

        self.patch_embed = nnx.Conv(
            3, cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=True, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.cls_token = nnx.Param(
            jax.random.normal(rngs.params(), (cfg.hidden_size,), jnp.float32)
            * 0.02)
        self.position_embedding = nnx.Param(
            jax.random.normal(rngs.params(),
                              (cfg.num_patches + 1, cfg.hidden_size),
                              jnp.float32) * 0.02)
        self.blocks = nnx.List([Dinov2Block(cfg, dtype=dtype, rngs=rngs)
                                for _ in range(cfg.num_layers)])
        self.layernorm = nnx.LayerNorm(
            cfg.hidden_size, epsilon=cfg.layer_norm_eps,
            param_dtype=jnp.float32, dtype=jnp.float32, rngs=rngs)

    def __call__(self, pixel_values: jnp.ndarray,
                 return_hidden: bool = False) -> jnp.ndarray:
        b = pixel_values.shape[0]
        patches = self.patch_embed(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, self.cfg.hidden_size)
        cls = jnp.broadcast_to(
            self.cls_token[...].astype(self.dtype)[None, None],
            (b, 1, self.cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        x = x + self.position_embedding[...].astype(self.dtype)[None]
        for blk in self.blocks:
            x = blk(x)
        x = self.layernorm(x)
        if return_hidden:
            return x
        return x[:, 0].astype(jnp.float32)     # pooler_output


# ------------------------------------------------------------- preprocessing

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

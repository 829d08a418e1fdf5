"""CLIP vision tower with projection, in JAX (ViT-bigG / ViT-L variants).

The reference encodes every video frame with the IP-Adapter SDXL image
encoder (CLIP ViT-bigG, 1280-d projected embeddings) and feeds the projected
``image_embeds`` as the per-timestep "text" stream
(reference: e2_tts_crossatt3.py:1423-1425,1659-1827). This is a from-scratch
JAX ViT with CLIP specifics: conv patch embed (no bias), learned class token
+ position embeddings, pre-layernorm blocks, quick-gelu/gelu switch, and the
final ``visual_projection`` applied to the layer-normed class token.

Frames are encoded in fixed-size batches under one jit — the per-frame python
loop of the reference becomes a single batched XLA program.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1664
    intermediate_size: int = 8192
    num_layers: int = 48
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1280
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"        # bigG: gelu; openai ViT-L: quick_gelu
    dtype: str = "bfloat16"

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def clip_vit_bigg() -> CLIPVisionConfig:
    """IP-Adapter SDXL image encoder (ViT-bigG-14, laion2b)."""
    return CLIPVisionConfig()


def clip_vit_l_336() -> CLIPVisionConfig:
    """openai/clip-vit-large-patch14-336 (the reference's clip_vit2 option)."""
    return CLIPVisionConfig(hidden_size=1024, intermediate_size=4096,
                            num_layers=24, num_heads=16, image_size=336,
                            patch_size=14, projection_dim=768,
                            hidden_act="quick_gelu")


def clip_tiny_test() -> CLIPVisionConfig:
    return CLIPVisionConfig(hidden_size=32, intermediate_size=64, num_layers=2,
                            num_heads=4, image_size=28, patch_size=14,
                            projection_dim=16, dtype="float32")


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nnx.sigmoid(1.702 * x)
    return lambda x: nnx.gelu(x, approximate=False)


class CLIPMLP(nnx.Module):
    def __init__(self, cfg: CLIPVisionConfig, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.fc1 = nnx.Linear(cfg.hidden_size, cfg.intermediate_size, **kw)
        self.fc2 = nnx.Linear(cfg.intermediate_size, cfg.hidden_size, **kw)
        self.act = _act(cfg.hidden_act)

    def __call__(self, x):
        return self.fc2(self.act(self.fc1(x)))


class CLIPAttention(nnx.Module):
    def __init__(self, cfg: CLIPVisionConfig, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        d = cfg.hidden_size
        self.q = nnx.Linear(d, d, **kw)
        self.k = nnx.Linear(d, d, **kw)
        self.v = nnx.Linear(d, d, **kw)
        self.o = nnx.Linear(d, d, **kw)
        self.heads = cfg.num_heads
        self.dh = d // cfg.num_heads

    def __call__(self, x):
        from v2ap_tpu.ops.flash_attention import (
            flash_attention, use_pallas_default,
        )
        b, n, d = x.shape
        split = lambda t: t.reshape(b, n, self.heads, self.dh
                                    ).transpose(0, 2, 1, 3)
        q, k, v = split(self.q(x)), split(self.k(x)), split(self.v(x))
        if use_pallas_default() and n >= 128:
            # Pallas flash path: never materialises the (b,h,n,n) scores in
            # HBM (bigG: ~270 MB f32 per 64-frame chunk per layer); tokens
            # pad to a 128-multiple with a kv mask. Measured on the 48-layer
            # bigG stack (scripts/probe_attn_variants.py): 255 ms vs 323 ms
            # for the XLA einsum path; a fused-qkv matmul and padding
            # head_dim 104->128 both came out SLOWER (324-357 ms) — the pad
            # materialises a ~200 MB copy and the fused (d,3d) matmul lays
            # out worse than three (d,d) ones, so keep it simple.
            npad = ((n + 127) // 128) * 128
            if npad != n:
                pad = [(0, 0), (0, 0), (0, npad - n), (0, 0)]
                q, k, v = (jnp.pad(t, pad) for t in (q, k, v))
            kv_mask = jnp.broadcast_to(jnp.arange(npad) < n, (b, npad))
            out = flash_attention(q, k, v, kv_mask, scale=self.dh ** -0.5,
                                  block_q=npad, block_k=npad)[:, :, :n]
        else:
            # keep matmul INPUTS in the compute dtype (bf16 rides the MXU at
            # full rate; f32 inputs run 1/8th speed on v5e) but ACCUMULATE in
            # f32 via preferred_element_type; softmax stays f32
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                           preferred_element_type=jnp.float32) * (self.dh ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(x.dtype), v,
                             preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
        return self.o(out)


class CLIPBlock(nnx.Module):
    def __init__(self, cfg: CLIPVisionConfig, *, dtype, rngs: nnx.Rngs):
        kw = dict(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                  dtype=jnp.float32, rngs=rngs)
        self.ln1 = nnx.LayerNorm(cfg.hidden_size, **kw)
        self.attn = CLIPAttention(cfg, dtype=dtype, rngs=rngs)
        self.ln2 = nnx.LayerNorm(cfg.hidden_size, **kw)
        self.mlp = CLIPMLP(cfg, dtype=dtype, rngs=rngs)

    def __call__(self, x):
        x = x + self.attn(self.ln1(x).astype(x.dtype))
        x = x + self.mlp(self.ln2(x).astype(x.dtype))
        return x


class CLIPVisionModel(nnx.Module):
    """pixel_values (b, H, W, 3) -> projected image embeds (b, projection_dim)."""

    def __init__(self, cfg: CLIPVisionConfig | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or clip_vit_bigg()
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype

        self.patch_embed = nnx.Conv(
            3, cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            use_bias=False, dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.class_embedding = nnx.Param(
            jax.random.normal(rngs.params(), (cfg.hidden_size,), jnp.float32) * 0.02)
        self.position_embedding = nnx.Param(
            jax.random.normal(rngs.params(),
                              (cfg.num_patches + 1, cfg.hidden_size),
                              jnp.float32) * 0.02)
        ln_kw = dict(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                     dtype=jnp.float32, rngs=rngs)
        self.pre_layernorm = nnx.LayerNorm(cfg.hidden_size, **ln_kw)
        self.blocks = nnx.List([CLIPBlock(cfg, dtype=dtype, rngs=rngs)
                                for _ in range(cfg.num_layers)])
        self.post_layernorm = nnx.LayerNorm(cfg.hidden_size, **ln_kw)
        self.visual_projection = nnx.Linear(
            cfg.hidden_size, cfg.projection_dim, use_bias=False, dtype=dtype,
            param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, pixel_values: jnp.ndarray,
                 return_hidden: bool = False) -> jnp.ndarray:
        b = pixel_values.shape[0]
        patches = self.patch_embed(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, self.cfg.hidden_size)
        cls = jnp.broadcast_to(
            self.class_embedding[...].astype(self.dtype)[None, None],
            (b, 1, self.cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        x = x + self.position_embedding[...].astype(self.dtype)[None]
        x = self.pre_layernorm(x).astype(self.dtype)
        for blk in self.blocks:
            x = blk(x)
        if return_hidden:
            return x
        pooled = self.post_layernorm(x[:, 0]).astype(self.dtype)
        return self.visual_projection(pooled).astype(jnp.float32)


# ------------------------------------------------------------- preprocessing

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_frames(frames, image_size: int = 224, mean=None, std=None,
                      normalize: bool = True):
    """uint8 RGB frames (t, H, W, 3) -> (t, S, S, 3).

    Matches CLIPImageProcessor defaults: resize shortest edge (bicubic),
    center crop, rescale 1/255, normalize. Host-side (numpy + PIL).
    ``mean``/``std`` default to the CLIP constants; DINOv2 towers pass the
    ImageNet ones. With ``normalize=False`` only the geometry runs and the
    result stays uint8 — the serving pipeline ships uint8 to the device
    (4x less host->device traffic) and normalises inside the jitted tower.
    """
    import numpy as np
    from PIL import Image

    dtype = np.float32 if normalize else np.uint8
    mean = np.asarray(mean if mean is not None else CLIP_MEAN, np.float32)
    std = np.asarray(std if std is not None else CLIP_STD, np.float32)

    # native fast path: PIL-exact fixed-point resample in C++ (the serving
    # host is often a single core where the PIL-per-frame loop costs
    # ~7 ms/frame; the native batch runs the same arithmetic ~4x faster)
    from v2ap_tpu import native
    fast = native.clip_preprocess_batch(np.ascontiguousarray(frames),
                                        image_size)
    if fast is not None:
        if not normalize:
            return fast
        return (fast.astype(np.float32) / 255.0 - mean) / std

    out = np.empty((len(frames), image_size, image_size, 3), dtype)

    def work(i):
        img = Image.fromarray(frames[i])
        w, h = img.size
        short = min(w, h)
        nw, nh = round(w * image_size / short), round(h * image_size / short)
        img = img.resize((nw, nh), Image.BICUBIC)
        left = (nw - image_size) // 2
        top = (nh - image_size) // 2
        img = img.crop((left, top, left + image_size, top + image_size))
        if normalize:
            arr = np.asarray(img, np.float32) / 255.0
            out[i] = (arr - mean) / std
        else:
            out[i] = np.asarray(img, np.uint8)

    # PIL releases the GIL in resize; thread across frames (but a pool on a
    # single-core host only adds contention — run serial there)
    import os as _os
    workers = min(8, _os.cpu_count() or 1)
    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(work, range(len(frames))))
    else:
        for i in range(len(frames)):
            work(i)
    return out


def device_normalize(px, mean, std):
    """uint8 pixels -> normalised float, on device (jit-side counterpart of
    ``preprocess_frames(normalize=False)``)."""
    import jax.numpy as jnp

    x = px.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)


# ------------------------------------------------- YUV 4:2:0 pixel shipping
#
# Serving hosts behind a tunnel move ~35 MB/s; the uint8 RGB frame batch for
# a 10 s clip is ~35 MB, a hard ~1 s of the cold-serving wall. The source
# video is h264 4:2:0 — its chroma was stored at half resolution to begin
# with — so re-subsampling the chroma planes after resize and reconstructing
# RGB on device halves the transfer (1.5 B/px) with only a chroma-resample
# error on top of the uint8 rounding the RGB path already incurs.
# Full-range BT.601; the forward/inverse pair below is exactly consistent,
# so the loss is uint8 rounding + 2x2 chroma averaging only.

def pack_yuv420(px: "np.ndarray"):
    """uint8 RGB (t, S, S, 3), S even -> (y: (t,S,S) u8, uv: (t,2,S/2,S/2) u8).

    Host-side. Chroma is 2x2 box-averaged. Native C++ fast path (fixed-point,
    ~4x the numpy float path on the 1-core serving host) with a vectorised
    numpy fallback; the two match to 1 LSB.
    """
    import numpy as np

    from v2ap_tpu import native
    fast = native.pack_yuv420(px)
    if fast is not None:
        return fast

    f = px.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 + (b - y) / 1.772
    cr = 128.0 + (r - y) / 1.402
    t, s, _ = y.shape
    h = s // 2

    def sub(c):
        return c.reshape(t, h, 2, h, 2).mean(axis=(2, 4))

    y8 = np.clip(y + 0.5, 0, 255).astype(np.uint8)
    uv = np.stack([sub(cb), sub(cr)], axis=1)
    uv8 = np.clip(uv + 0.5, 0, 255).astype(np.uint8)
    return y8, uv8


def unpack_yuv420(y, uv, mean, std):
    """Device-side inverse of ``pack_yuv420`` + CLIP normalisation:
    (t,S,S) u8 + (t,2,S/2,S/2) u8 -> (t,S,S,3) normalised float."""
    import jax.numpy as jnp

    yf = y.astype(jnp.float32)
    uvf = uv.astype(jnp.float32) - 128.0
    # nearest 2x upsample of the chroma planes
    uvf = jnp.repeat(jnp.repeat(uvf, 2, axis=-2), 2, axis=-1)
    cb, cr = uvf[:, 0], uvf[:, 1]
    r = yf + 1.402 * cr
    b = yf + 1.772 * cb
    g = (yf - 0.299 * r - 0.114 * b) / 0.587
    x = jnp.stack([r, g, b], axis=-1) / 255.0
    x = jnp.clip(x, 0.0, 1.0)
    return (x - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)

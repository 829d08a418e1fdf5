"""CLAP (contrastive language-audio pretraining) in JAX: HTSAT Swin audio
tower + RoBERTa text tower + projection heads.

The reference vendors a full CLAP package (~10.6 kLoC,
src/audioldm/clap/) consumed by its training-data filter
(torch_tools.py:163-203). This is the TPU-native replacement, structured
after HF ``ClapModel`` so the published ``laion/clap-htsat-unfused``
checkpoint converts directly (parity-tested against transformers on tiny
configs in tests/test_clap.py).

Audio path: log-mel (b, 1, T, mels) -> BatchNorm over mel bins ->
reshape_mel2img (freq-ratio folding to a square spec_size x spec_size
"image") -> 4x4 patch embed -> Swin stages (windowed attention with
relative-position bias, shifted windows on odd blocks, patch merging) ->
LayerNorm -> token mean pool -> 2-layer projection (relu).

Text path: RoBERTa (learned positions offset past the pad id, post-LN
blocks) -> CLS pooler (dense+tanh) -> projection.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


@dataclasses.dataclass(frozen=True)
class ClapAudioConfig:
    spec_size: int = 256
    num_mel_bins: int = 64
    patch_size: int = 4
    patch_stride: int = 4
    patch_embeds_hidden_size: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512
    projection_hidden_size: int = 768
    dtype: str = "float32"

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def num_features(self) -> int:
        return self.patch_embeds_hidden_size * 2 ** (len(self.depths) - 1)


@dataclasses.dataclass(frozen=True)
class ClapTextConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-12
    projection_dim: int = 512
    dtype: str = "float32"


def clap_htsat_unfused() -> Tuple[ClapAudioConfig, ClapTextConfig]:
    """laion/clap-htsat-unfused — the standard audio-text scorer."""
    return ClapAudioConfig(), ClapTextConfig()


def clap_tiny_test() -> Tuple[ClapAudioConfig, ClapTextConfig]:
    audio = ClapAudioConfig(
        spec_size=32, num_mel_bins=8, patch_embeds_hidden_size=16,
        depths=(1, 1), num_heads=(2, 4), window_size=4, projection_dim=24,
        projection_hidden_size=32)
    text = ClapTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                          num_heads=4, intermediate_size=64,
                          max_position_embeddings=64, projection_dim=24)
    return audio, text


class ClapProjection(nnx.Module):
    """2-layer projection head: linear -> relu -> linear (HF
    ClapProjectionLayer, projection_hidden_act="relu")."""

    def __init__(self, din: int, dout: int, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.linear1 = nnx.Linear(din, dout, **kw)
        self.linear2 = nnx.Linear(dout, dout, **kw)

    def __call__(self, x):
        return self.linear2(nnx.relu(self.linear1(x)))


# ----------------------------------------------------------------- audio side

def relative_position_index(window: int) -> np.ndarray:
    """(window^2, window^2) index into the (2w-1)^2 bias table (Swin)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1)


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(b, H, W, c) -> (b * H/w * W/w, w*w, c)."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(x: jnp.ndarray, w: int, h: int, ww: int) -> jnp.ndarray:
    b = x.shape[0] // (h // w * (ww // w))
    x = x.reshape(b, h // w, ww // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, -1)


def shift_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, w*w, w*w) additive mask for shifted windows (-100 off)."""
    img = np.zeros((1, h, w, 1), np.float32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    count = 0
    for hs in slices:
        for ws in slices:
            img[:, hs, ws, :] = count
            count += 1
    # pure numpy (window_partition is generic reshape/transpose): routing the
    # constant through jnp breaks traced construction (create_model)
    mw = window_partition(img, window)[..., 0]
    diff = mw[:, None, :] - mw[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinAttention(nnx.Module):
    def __init__(self, cfg: ClapAudioConfig, dim: int, heads: int, *,
                 dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=cfg.qkv_bias, dtype=dtype,
                  param_dtype=jnp.float32, rngs=rngs)
        self.q = nnx.Linear(dim, dim, **kw)
        self.k = nnx.Linear(dim, dim, **kw)
        self.v = nnx.Linear(dim, dim, **kw)
        self.o = nnx.Linear(dim, dim, dtype=dtype, param_dtype=jnp.float32,
                            rngs=rngs)
        w = cfg.window_size
        self.heads = heads
        self.dh = dim // heads
        self.bias_table = nnx.Param(
            jnp.zeros(((2 * w - 1) ** 2, heads), jnp.float32))
        self.rel_index = nnx.Variable(
            jnp.asarray(relative_position_index(w)))

    def __call__(self, x, attn_mask=None):
        # x: (nW*b, n, dim); attn_mask: (nW, n, n) or None
        bw, n, d = x.shape
        split = lambda t: t.reshape(bw, n, self.heads, self.dh
                                    ).transpose(0, 2, 1, 3)
        q, k, v = split(self.q(x)), split(self.k(x)), split(self.v(x))
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(self.dh)
        bias = self.bias_table[...][self.rel_index[...].reshape(-1)]
        bias = bias.reshape(n, n, -1).transpose(2, 0, 1)
        s = s + bias[None]
        if attn_mask is not None:
            nw = attn_mask.shape[0]
            s = s.reshape(bw // nw, nw, self.heads, n, n)
            s = s + attn_mask[None, :, None]
            s = s.reshape(bw, self.heads, n, n)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        out = out.astype(x.dtype).transpose(0, 2, 1, 3).reshape(bw, n, d)
        return self.o(out)


class SwinBlock(nnx.Module):
    def __init__(self, cfg: ClapAudioConfig, dim: int, heads: int,
                 resolution: int, shift: int, *, dtype, rngs: nnx.Rngs):
        # window shrinks to the resolution when it no longer fits; the shift
        # is then dropped (HF set_shift_and_window_size)
        self.window = min(cfg.window_size, resolution)
        self.shift = shift if self.window < resolution else 0
        self.resolution = resolution
        ln_kw = dict(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                     dtype=jnp.float32, rngs=rngs)
        self.ln1 = nnx.LayerNorm(dim, **ln_kw)
        self.attn = SwinAttention(cfg, dim, heads, dtype=dtype, rngs=rngs)
        self.ln2 = nnx.LayerNorm(dim, **ln_kw)
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        hidden = int(cfg.mlp_ratio * dim)
        self.fc1 = nnx.Linear(dim, hidden, **kw)
        self.fc2 = nnx.Linear(hidden, dim, **kw)
        self.attn_mask = (nnx.Variable(jnp.asarray(shift_attn_mask(
            resolution, resolution, self.window, self.shift)))
            if self.shift > 0 else None)

    def __call__(self, x):
        b, n, c = x.shape
        r = self.resolution
        shortcut = x
        h = self.ln1(x).astype(x.dtype).reshape(b, r, r, c)
        if self.shift > 0:
            h = jnp.roll(h, (-self.shift, -self.shift), axis=(1, 2))
        win = window_partition(h, self.window)
        win = self.attn(win, self.attn_mask[...] if self.attn_mask else None)
        h = window_reverse(win.reshape(-1, self.window, self.window, c),
                           self.window, r, r)
        if self.shift > 0:
            h = jnp.roll(h, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + h.reshape(b, n, c)
        h = self.ln2(x).astype(x.dtype)
        h = self.fc2(nnx.gelu(self.fc1(h), approximate=False))
        return x + h


class PatchMerging(nnx.Module):
    def __init__(self, cfg: ClapAudioConfig, dim: int, *, dtype,
                 rngs: nnx.Rngs):
        self.norm = nnx.LayerNorm(4 * dim, epsilon=cfg.layer_norm_eps,
                                  param_dtype=jnp.float32, dtype=jnp.float32,
                                  rngs=rngs)
        self.reduction = nnx.Linear(4 * dim, 2 * dim, use_bias=False,
                                    dtype=dtype, param_dtype=jnp.float32,
                                    rngs=rngs)

    def __call__(self, x, resolution: int):
        b, n, c = x.shape
        r = resolution
        x = x.reshape(b, r, r, c)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(b, (r // 2) * (r // 2), 4 * c)
        return self.reduction(self.norm(x).astype(self.reduction.kernel.dtype))


class ClapAudioModel(nnx.Module):
    """log-mel input_features (b, 1, T, mels) -> pooled features
    (b, num_features), matching HF ``ClapAudioModel().pooler_output``."""

    def __init__(self, cfg: ClapAudioConfig | None = None, *,
                 rngs: nnx.Rngs):
        self.cfg = cfg or ClapAudioConfig()
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype

        self.batch_norm = nnx.BatchNorm(
            cfg.num_mel_bins, use_running_average=True, dtype=jnp.float32,
            param_dtype=jnp.float32, rngs=rngs)
        self.patch_embed = nnx.Conv(
            1, cfg.patch_embeds_hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_stride, cfg.patch_stride), padding="VALID",
            dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        ln_kw = dict(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                     dtype=jnp.float32, rngs=rngs)
        self.patch_norm = nnx.LayerNorm(cfg.patch_embeds_hidden_size, **ln_kw)

        grid = cfg.spec_size // cfg.patch_stride
        stages, mergers = [], []
        for s, depth in enumerate(cfg.depths):
            dim = cfg.patch_embeds_hidden_size * 2 ** s
            res = grid // 2 ** s
            blocks = [SwinBlock(cfg, dim, cfg.num_heads[s], res,
                                0 if i % 2 == 0 else cfg.window_size // 2,
                                dtype=dtype, rngs=rngs)
                      for i in range(depth)]
            stages.append(nnx.List(blocks))
            if s < len(cfg.depths) - 1:
                mergers.append(PatchMerging(cfg, dim, dtype=dtype, rngs=rngs))
        self.stages = nnx.List(stages)
        self.mergers = nnx.List(mergers)
        self.grid = grid
        self.norm = nnx.LayerNorm(cfg.num_features, **ln_kw)

    def reshape_mel2img(self, feats: jnp.ndarray) -> jnp.ndarray:
        """(b, 1, T, mels) -> (b, spec, spec, 1) freq-ratio folding (HF
        reshape_mel2img; NHWC here). Shorter clips interpolate up to the
        expected time width (bicubic)."""
        cfg = self.cfg
        b, c, t, f = feats.shape
        spec_w = cfg.spec_size * cfg.freq_ratio
        spec_h = cfg.spec_size // cfg.freq_ratio
        assert t <= spec_w and f <= spec_h, (t, f, spec_w, spec_h)
        if t < spec_w or f < spec_h:
            feats = jax.image.resize(feats, (b, c, spec_w, spec_h), "bicubic")
            t, f = spec_w, spec_h
        x = feats.reshape(b, c * cfg.freq_ratio, t // cfg.freq_ratio, f)
        x = x.transpose(0, 1, 3, 2)
        x = x.reshape(b, c, f * cfg.freq_ratio, t // cfg.freq_ratio)
        return x.transpose(0, 2, 3, 1)                     # NHWC

    def __call__(self, input_features: jnp.ndarray) -> jnp.ndarray:
        # BN over mel bins (HF transposes mels into the channel axis)
        x = self.batch_norm(input_features.astype(jnp.float32))
        img = self.reshape_mel2img(x)
        h = self.patch_embed(img.astype(self.dtype))
        b = h.shape[0]
        h = h.reshape(b, -1, self.cfg.patch_embeds_hidden_size)
        h = self.patch_norm(h).astype(self.dtype)
        for s, blocks in enumerate(self.stages):
            for blk in blocks:
                h = blk(h)
            if s < len(self.stages) - 1:
                h = self.mergers[s](h, self.grid // 2 ** s)
        h = self.norm(h)
        # HF's freq-bin regroup + AdaptiveAvgPool1d(1) reduces to the token
        # mean (the regroup permutes positions; the pool averages them all)
        return jnp.mean(h, axis=1).astype(jnp.float32)


# ------------------------------------------------------------------ text side

class RobertaLayer(nnx.Module):
    def __init__(self, cfg: ClapTextConfig, *, dtype, rngs: nnx.Rngs):
        d = cfg.hidden_size
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        ln_kw = dict(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                     dtype=jnp.float32, rngs=rngs)
        self.q = nnx.Linear(d, d, **kw)
        self.k = nnx.Linear(d, d, **kw)
        self.v = nnx.Linear(d, d, **kw)
        self.attn_out = nnx.Linear(d, d, **kw)
        self.attn_ln = nnx.LayerNorm(d, **ln_kw)
        self.inter = nnx.Linear(d, cfg.intermediate_size, **kw)
        self.out = nnx.Linear(cfg.intermediate_size, d, **kw)
        self.out_ln = nnx.LayerNorm(d, **ln_kw)
        self.heads = cfg.num_heads
        self.dh = d // cfg.num_heads

    def __call__(self, x, mask):
        b, n, d = x.shape
        split = lambda t: t.reshape(b, n, self.heads, self.dh
                                    ).transpose(0, 2, 1, 3)
        q, k, v = split(self.q(x)), split(self.k(x)), split(self.v(x))
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) / np.sqrt(self.dh)
        s = jnp.where(mask[:, None, None, :], s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
        ctx = ctx.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)
        x = self.attn_ln(self.attn_out(ctx) + x).astype(x.dtype)  # post-LN
        h = self.out(nnx.gelu(self.inter(x), approximate=False))
        return self.out_ln(h + x).astype(x.dtype)


class ClapTextModel(nnx.Module):
    """RoBERTa encoder + CLS pooler (dense+tanh), matching HF
    ``ClapTextModel().pooler_output``."""

    def __init__(self, cfg: ClapTextConfig | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or ClapTextConfig()
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.word_emb = nnx.Embed(cfg.vocab_size, cfg.hidden_size,
                                  param_dtype=jnp.float32, rngs=rngs)
        self.pos_emb = nnx.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                                 param_dtype=jnp.float32, rngs=rngs)
        self.type_emb = nnx.Embed(cfg.type_vocab_size, cfg.hidden_size,
                                  param_dtype=jnp.float32, rngs=rngs)
        self.emb_ln = nnx.LayerNorm(cfg.hidden_size,
                                    epsilon=cfg.layer_norm_eps,
                                    param_dtype=jnp.float32,
                                    dtype=jnp.float32, rngs=rngs)
        self.layers = nnx.List([RobertaLayer(cfg, dtype=dtype, rngs=rngs)
                                for _ in range(cfg.num_layers)])
        self.pooler = nnx.Linear(cfg.hidden_size, cfg.hidden_size, **kw)

    def __call__(self, ids: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        # RoBERTa position ids: cumulative over non-pad tokens, offset past
        # the pad id (create_position_ids_from_input_ids — keyed on the ids
        # themselves, not the attention mask)
        m = (ids != cfg.pad_token_id).astype(jnp.int32)
        pos = jnp.cumsum(m, axis=1) * m + cfg.pad_token_id
        x = (self.word_emb(ids) + self.pos_emb(pos)
             + self.type_emb(jnp.zeros_like(ids)))
        x = self.emb_ln(x).astype(self.dtype)
        bmask = mask.astype(bool)
        for layer in self.layers:
            x = layer(x, bmask)
        return jnp.tanh(self.pooler(x[:, 0])).astype(jnp.float32)


# -------------------------------------------------------------------- scorer

class ClapModel(nnx.Module):
    """Audio-text similarity scorer (HF ``ClapModel`` surface)."""

    def __init__(self, audio_cfg: ClapAudioConfig | None = None,
                 text_cfg: ClapTextConfig | None = None, *, rngs: nnx.Rngs):
        audio_cfg = audio_cfg or ClapAudioConfig()
        text_cfg = text_cfg or ClapTextConfig()
        dtype = jnp.dtype(audio_cfg.dtype)
        self.audio_model = ClapAudioModel(audio_cfg, rngs=rngs)
        self.text_model = ClapTextModel(text_cfg, rngs=rngs)
        self.audio_projection = ClapProjection(
            audio_cfg.num_features, audio_cfg.projection_dim, dtype=dtype,
            rngs=rngs)
        self.text_projection = ClapProjection(
            text_cfg.hidden_size, text_cfg.projection_dim, dtype=dtype,
            rngs=rngs)

    def get_audio_features(self, input_features: jnp.ndarray) -> jnp.ndarray:
        emb = self.audio_projection(self.audio_model(input_features))
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def get_text_features(self, ids: jnp.ndarray,
                          mask: jnp.ndarray) -> jnp.ndarray:
        emb = self.text_projection(self.text_model(ids, mask))
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def similarity(self, input_features, ids, mask) -> jnp.ndarray:
        """Cosine similarity (b,) between paired audio and text."""
        a = self.get_audio_features(input_features)
        t = self.get_text_features(ids, mask)
        return jnp.sum(a * t, axis=-1)


# ----------------------------------------------------------------- frontend

def clap_logmel(waveform: np.ndarray, sr: int = 48_000, n_fft: int = 1024,
                hop: int = 480, n_mels: int = 64, fmin: float = 50.0,
                fmax: float = 14_000.0, slaney: bool = True) -> np.ndarray:
    """(b, t) @ 48 kHz -> (b, 1, frames, n_mels) log-mel dB, matching HF
    ClapFeatureExtractor's "rand_trunc" path (slaney filters; the "fusion"
    path uses HTK — pass slaney=False)."""
    import jax.numpy as jnp_
    from v2ap_tpu.ops.melspec import mel_filterbank

    wav = jnp.asarray(np.atleast_2d(waveform), jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    frames = 1 + (x.shape[1] - n_fft) // hop
    idx = jnp.arange(frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    segs = x[:, idx]
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1], jnp.float32)
    power = jnp.abs(jnp.fft.rfft(segs * window)) ** 2
    fb = jnp_.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax,
                                     slaney_norm=slaney,
                                     slaney_scale=slaney))
    mel = jnp.einsum("bfk,mk->bfm", power, fb)
    db = 10.0 * jnp.log10(jnp.clip(mel, 1e-10, None))
    return np.asarray(db)[:, None]                     # (b, 1, frames, mels)

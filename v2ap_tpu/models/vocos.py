"""Vocos mel vocoder in JAX (the reference's ``use_vocos`` /
``pretrained_vocos_path='charactr/vocos-mel-24khz'`` option,
e2_tts_crossatt3.py:47-49,1304-1305,1402-1409 and the ``self.vocos.decode``
sampling path :2275-2283).

Architecture (charactr/vocos-mel-24khz): embed Conv1d(100->512, k7) ->
LayerNorm -> 8 x 1-D ConvNeXt blocks (depthwise k7, LN, 512->1536->512
pointwise MLP with GELU, LayerScale) -> final LayerNorm -> ISTFT head:
Linear(512 -> n_fft+2) producing log-magnitude + phase, inverse rFFT and
windowed overlap-add (n_fft 1024 / hop 256, centre-trimmed).

TPU-first: the overlap-add is a shifted-sum (n_fft/hop = 4 shifted copies of
the frame tensor), not a scatter — everything static-shaped and jittable; the
matmul-heavy pointwise convs ride the MXU in bf16.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np
from flax import nnx


@dataclasses.dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 100            # mel bins
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    sampling_rate: int = 24_000
    layer_norm_eps: float = 1e-6
    dtype: str = "float32"


def vocos_mel_24khz() -> VocosConfig:
    return VocosConfig()


def vocos_tiny_test() -> VocosConfig:
    return VocosConfig(input_channels=8, dim=16, intermediate_dim=32,
                       num_layers=2, n_fft=16, hop_length=4)


@functools.lru_cache(maxsize=8)
def _hann(n_fft: int) -> np.ndarray:
    """torch.hann_window(n_fft, periodic=True)."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
            ).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _envelope(frames: int, n_fft: int, hop: int) -> np.ndarray:
    """Sum of squared windows at each output sample (torch.istft's
    normalisation denominator), full untrimmed length."""
    win_sq = _hann(n_fft) ** 2
    env = np.zeros((frames - 1) * hop + n_fft, np.float64)
    for t in range(frames):
        env[t * hop: t * hop + n_fft] += win_sq
    return np.maximum(env, 1e-11).astype(np.float32)


def istft(spec: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Centre-padded inverse STFT.  spec: complex (b, frames, n_fft//2+1)
    -> waveform (b, (frames-1)*hop), matching ``torch.istft(...,
    center=True)`` up to the trimmed edges.

    Overlap-add is a shifted-sum: with r = n_fft//hop, each time-domain frame
    splits into r hop-sized chunks, and chunk k of every frame lands at a
    constant offset k*hop — so the whole OLA is r padded adds of reshaped
    (b, frames*hop) tensors. No scatter, fully static shapes.
    """
    assert n_fft % hop == 0, "shifted-sum OLA needs hop | n_fft"
    r = n_fft // hop
    b, frames, _ = spec.shape
    window = jnp.asarray(_hann(n_fft))
    td = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window    # (b, frames, n_fft)
    chunks = td.reshape(b, frames, r, hop)
    total = (frames - 1) * hop + n_fft                     # = (frames+r-1)*hop
    out = jnp.zeros((b, total), td.dtype)
    for k in range(r):
        flat = chunks[:, :, k, :].reshape(b, frames * hop)
        out = out + jnp.pad(flat, ((0, 0), (k * hop, (r - 1 - k) * hop)))
    out = out / jnp.asarray(_envelope(frames, n_fft, hop))
    half = n_fft // 2                                      # centre trim
    return out[:, half: total - half]


class ConvNeXt1dBlock(nnx.Module):
    """Vocos backbone block (vocos/models.py ConvNeXtBlock): depthwise conv
    k7 -> LN -> pointwise MLP (GELU) -> LayerScale, residual."""

    def __init__(self, cfg: VocosConfig, *, dtype, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.dwconv = nnx.Conv(cfg.dim, cfg.dim, (7,), padding=((3, 3),),
                               feature_group_count=cfg.dim, **kw)
        self.norm = nnx.LayerNorm(cfg.dim, epsilon=cfg.layer_norm_eps,
                                  param_dtype=jnp.float32, dtype=jnp.float32,
                                  rngs=rngs)
        self.pwconv1 = nnx.Linear(cfg.dim, cfg.intermediate_dim, **kw)
        self.pwconv2 = nnx.Linear(cfg.intermediate_dim, cfg.dim, **kw)
        self.gamma = nnx.Param(
            jnp.full((cfg.dim,), 1.0 / cfg.num_layers, jnp.float32))

    def __call__(self, x):                                 # (b, t, c)
        h = self.dwconv(x)
        h = self.norm(h).astype(x.dtype)
        h = self.pwconv2(nnx.gelu(self.pwconv1(h), approximate=False))
        return x + h * self.gamma[...].astype(x.dtype)


class Vocos(nnx.Module):
    """log-mel (b, frames, n_mels) -> waveform (b, (frames-1)*hop)."""

    def __init__(self, cfg: VocosConfig | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or vocos_mel_24khz()
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.embed = nnx.Conv(cfg.input_channels, cfg.dim, (7,),
                              padding=((3, 3),), **kw)
        ln = dict(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                  dtype=jnp.float32, rngs=rngs)
        self.norm = nnx.LayerNorm(cfg.dim, **ln)
        self.blocks = nnx.List([ConvNeXt1dBlock(cfg, dtype=dtype, rngs=rngs)
                                for _ in range(cfg.num_layers)])
        self.final_norm = nnx.LayerNorm(cfg.dim, **ln)
        self.head = nnx.Linear(cfg.dim, cfg.n_fft + 2, **kw)

    def backbone(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = self.embed(mel.astype(self.dtype))
        x = self.norm(x).astype(self.dtype)
        for blk in self.blocks:
            x = blk(x)
        return self.final_norm(x)                          # (b, t, dim) f32

    def decode(self, mel: jnp.ndarray) -> jnp.ndarray:
        """The ``EncodecWrapper.decode``-shaped vocoder interface the sampler
        consumes (reference :2283 ``self.vocos.decode(one_out)``); accepts
        (b, frames, n_mels) or channels-first (b, n_mels, frames)."""
        if mel.shape[-1] != self.cfg.input_channels:
            mel = jnp.swapaxes(mel, -1, -2)
        h = self.backbone(mel)
        out = self.head(h.astype(self.dtype)).astype(jnp.float32)
        half = self.cfg.n_fft // 2 + 1
        # clip the MAGNITUDE at 1e2 (Vocos: exp(x).clamp(max=1e2)) — clipping
        # the log-magnitude instead would allow e^100 and overflow f32
        mag = jnp.clip(jnp.exp(out[..., :half]), None, 1e2)
        phase = out[..., half:]
        spec = mag * jnp.exp(1j * phase.astype(jnp.float32))
        return istft(spec, self.cfg.n_fft, self.cfg.hop_length)

    __call__ = decode

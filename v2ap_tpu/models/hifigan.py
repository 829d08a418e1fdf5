"""HiFi-GAN generator in JAX (mel -> waveform vocoder).

Completes the reference's alternative vocoder path (vendored
src/audioldm/hifigan/models.py:112-174, used by the ``VaeWrapper`` option;
the shipped V2A checkpoints use EnCodec instead): conv_pre -> N x
(transposed-conv upsample + multi-receptive-field fusion of dilated residual
blocks) -> tanh conv_out. NWC layout, leaky-relu 0.1, weight-norm folded at
conversion. Defaults match the AudioLDM 16 kHz / hop-160 config.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax
from flax import nnx


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    in_channels: int = 64                 # mel bins
    upsample_initial_channel: int = 1024
    upsample_rates: Sequence[int] = (5, 4, 2, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (16, 16, 8, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    sampling_rate: int = 16_000

    @property
    def hop_length(self) -> int:
        return int(math.prod(self.upsample_rates))


class Conv1d(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, dilation=1, *, rngs: nnx.Rngs):
        self.stride = stride
        self.dilation = dilation
        self.pad = (k - 1) * dilation // 2
        scale = 1.0 / math.sqrt(cin * k)
        self.kernel = nnx.Param(jax.random.uniform(
            rngs.params(), (k, cin, cout), jnp.float32, -scale, scale))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        out = lax.conv_general_dilated(
            x, self.kernel[...], (self.stride,),
            [(self.pad, self.pad)], rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return out + self.bias[...]


class ConvTranspose1d(nnx.Module):
    """stride-u upsampling transposed conv with torch's implicit padding
    semantics (padding = (k - u) // 2)."""

    def __init__(self, cin, cout, k, stride, *, rngs: nnx.Rngs):
        self.stride = stride
        self.k = k
        self.pad = (k - stride) // 2
        scale = 1.0 / math.sqrt(cin * k)
        self.kernel = nnx.Param(jax.random.uniform(
            rngs.params(), (k, cout, cin), jnp.float32, -scale, scale))
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x):
        out = lax.conv_transpose(
            x, self.kernel[...], (self.stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)
        out = out + self.bias[...]
        if self.pad:
            out = out[:, self.pad:-self.pad or None]
        return out


class ResBlock(nnx.Module):
    """HiFi-GAN v1 residual block: pairs of dilated+plain convs."""

    def __init__(self, ch, k, dilations, *, rngs: nnx.Rngs):
        self.convs1 = nnx.List([Conv1d(ch, ch, k, dilation=d, rngs=rngs)
                                for d in dilations])
        self.convs2 = nnx.List([Conv1d(ch, ch, k, dilation=1, rngs=rngs)
                                for _ in dilations])

    def __call__(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            h = c1(nnx.leaky_relu(x, 0.1))
            h = c2(nnx.leaky_relu(h, 0.1))
            x = x + h
        return x


class HiFiGANGenerator(nnx.Module):
    def __init__(self, cfg: HiFiGANConfig | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or HiFiGANConfig()
        cfg = self.cfg
        self.conv_pre = Conv1d(cfg.in_channels, cfg.upsample_initial_channel,
                               7, rngs=rngs)
        self.ups = nnx.List()
        self.resblocks = nnx.List()
        ch = cfg.upsample_initial_channel
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            self.ups.append(ConvTranspose1d(ch, ch // 2, k, u, rngs=rngs))
            ch //= 2
            for rk, dil in zip(cfg.resblock_kernel_sizes,
                               cfg.resblock_dilations):
                self.resblocks.append(ResBlock(ch, rk, dil, rngs=rngs))
        self.conv_post = Conv1d(ch, 1, 7, rngs=rngs)
        self.num_kernels = len(cfg.resblock_kernel_sizes)

    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel (b, frames, n_mels) -> waveform (b, frames * hop)."""
        x = self.conv_pre(mel.astype(jnp.float32))
        for i, up in enumerate(self.ups):
            x = up(nnx.leaky_relu(x, 0.1))
            acc = None
            for j in range(self.num_kernels):
                out = self.resblocks[i * self.num_kernels + j](x)
                acc = out if acc is None else acc + out
            x = acc / self.num_kernels
        x = self.conv_post(nnx.leaky_relu(x, 0.1))
        return jnp.tanh(x)[..., 0]

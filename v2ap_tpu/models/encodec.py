"""EnCodec 24 kHz neural audio codec in JAX (SEANet conv stacks + LSTM).

The reference uses the frozen HF ``facebook/encodec_24khz`` continuous
encoder latents (128ch @ 75 Hz) as its "mel" representation and the decoder
as the vocoder (reference: e2_tts_crossatt3.py:419-437). This is a TPU-native
re-implementation with exact causal-padding semantics so converted torch
weights are numerically interchangeable (parity test:
tests/test_encodec.py, vs a randomly-initialised HF EncodecModel).

Layout is NWC throughout (TPU-native conv layout); all shapes static, so the
whole encode/decode path jits into one XLA program. Weight-norm is folded into
plain kernels at conversion time (the codec is frozen here). The residual
vector quantizer is included for completeness (codes <-> latents) even though
the V2A path runs on continuous latents.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from flax import nnx


@dataclasses.dataclass(frozen=True)
class EncodecConfig:
    sampling_rate: int = 24_000
    audio_channels: int = 1
    hidden_size: int = 128
    num_filters: int = 32
    num_residual_layers: int = 1
    upsampling_ratios: Sequence[int] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    use_causal_conv: bool = True
    pad_mode: str = "reflect"
    compress: int = 2
    num_lstm_layers: int = 2
    trim_right_ratio: float = 1.0
    codebook_size: int = 1024
    num_quantizers: int = 32

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsampling_ratios))


class Elu(nnx.Module):
    """Placeholder module keeping layer indices aligned with the HF stack."""

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.elu(x)


def _pad1d(x: jnp.ndarray, left: int, right: int, mode: str) -> jnp.ndarray:
    """Pad time axis of (b, t, c); handles reflect on too-short inputs the way
    the reference codec does (temporary zero-extend)."""
    if mode == "zero" or mode == "constant":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    length = x.shape[1]
    max_pad = max(left, right)
    extra = 0
    if length <= max_pad:
        extra = max_pad - length + 1
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    out = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
    if extra:
        out = out[:, : out.shape[1] - extra]
    return out


class CausalConv1d(nnx.Module):
    """Conv1d with EnCodec's causal / asymmetric padding semantics."""

    def __init__(self, cfg: EncodecConfig, cin: int, cout: int, kernel: int,
                 stride: int = 1, dilation: int = 1, *, rngs: nnx.Rngs):
        self.causal = cfg.use_causal_conv
        self.pad_mode = cfg.pad_mode
        self.stride = stride
        self.dilation = dilation
        self.kernel_eff = (kernel - 1) * dilation + 1
        self.padding_total = self.kernel_eff - stride
        k = 1.0 / math.sqrt(cin * kernel)
        init = jax.random.uniform(rngs.params(), (kernel, cin, cout),
                                  jnp.float32, -k, k)
        self.kernel = nnx.Param(init)
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (b, t, c)
        length = x.shape[1]
        n_frames = (length - self.kernel_eff + self.padding_total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + self.kernel_eff - self.padding_total
        extra = max(ideal - length, 0)
        if self.causal:
            x = _pad1d(x, self.padding_total, extra, self.pad_mode)
        else:
            right = self.padding_total // 2
            left = self.padding_total - right
            x = _pad1d(x, left, right + extra, self.pad_mode)
        out = lax.conv_general_dilated(
            x, self.kernel[...],
            window_strides=(self.stride,), padding="VALID",
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return out + self.bias[...]


class CausalConvTranspose1d(nnx.Module):
    def __init__(self, cfg: EncodecConfig, cin: int, cout: int, kernel: int,
                 stride: int = 1, *, rngs: nnx.Rngs):
        self.causal = cfg.use_causal_conv
        self.stride = stride
        self.kernel_size = kernel
        self.trim_right_ratio = cfg.trim_right_ratio
        k = 1.0 / math.sqrt(cin * kernel)
        # store torch layout (cin, cout, k) transposed to (k, cout, cin) for lax
        init = jax.random.uniform(rngs.params(), (kernel, cout, cin),
                                  jnp.float32, -k, k)
        self.kernel = nnx.Param(init)
        self.bias = nnx.Param(jnp.zeros((cout,), jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # kernel stored (k, cout, cin); with transpose_kernel=True lax expects
        # the *forward* conv layout, i.e. I == cout of this op, O == cin.
        out = lax.conv_transpose(
            x, self.kernel[...], strides=(self.stride,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True,
        )
        out = out + self.bias[...]
        padding_total = self.kernel_size - self.stride
        if self.causal:
            right = math.ceil(padding_total * self.trim_right_ratio)
        else:
            right = padding_total // 2
        left = padding_total - right
        end = out.shape[1] - right
        return out[:, left:end]


class ResnetBlock1d(nnx.Module):
    def __init__(self, cfg: EncodecConfig, dim: int, dilations: Sequence[int],
                 *, rngs: nnx.Rngs):
        hidden = dim // cfg.compress
        kernels = (cfg.residual_kernel_size, 1)
        self.block = nnx.List()
        for i, (k, d) in enumerate(zip(kernels, dilations)):
            cin = dim if i == 0 else hidden
            cout = dim if i == len(kernels) - 1 else hidden
            self.block.append(CausalConv1d(cfg, cin, cout, k, dilation=d, rngs=rngs))
        self.shortcut = CausalConv1d(cfg, dim, dim, 1, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x
        for conv in self.block:
            h = conv(jax.nn.elu(h))
        return self.shortcut(x) + h


class ResidualLSTM(nnx.Module):
    """Multi-layer LSTM over (b, t, c) with residual connection, torch
    gate layout (i, f, g, o) for weight interchangeability."""

    def __init__(self, dim: int, num_layers: int, *, rngs: nnx.Rngs):
        self.dim = dim
        self.num_layers = num_layers
        self.w_ih, self.w_hh, self.b_ih, self.b_hh = (nnx.List(), nnx.List(), nnx.List(), nnx.List())
        k = 1.0 / math.sqrt(dim)
        for _ in range(num_layers):
            self.w_ih.append(nnx.Param(jax.random.uniform(
                rngs.params(), (4 * dim, dim), jnp.float32, -k, k)))
            self.w_hh.append(nnx.Param(jax.random.uniform(
                rngs.params(), (4 * dim, dim), jnp.float32, -k, k)))
            self.b_ih.append(nnx.Param(jax.random.uniform(
                rngs.params(), (4 * dim,), jnp.float32, -k, k)))
            self.b_hh.append(nnx.Param(jax.random.uniform(
                rngs.params(), (4 * dim,), jnp.float32, -k, k)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, c = x.shape
        h = x.astype(jnp.float32)
        for layer in range(self.num_layers):
            w_ih = self.w_ih[layer][...].T        # (c, 4c)
            w_hh = self.w_hh[layer][...].T
            bias = self.b_ih[layer][...] + self.b_hh[layer][...]
            x_proj = jnp.einsum("btc,cd->btd", h, w_ih) + bias  # precompute

            def step(carry, xp):
                hp, cp = carry
                gates = xp + hp @ w_hh
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                i, f, o = nnx.sigmoid(i), nnx.sigmoid(f), nnx.sigmoid(o)
                g = jnp.tanh(g)
                cn = f * cp + i * g
                hn = o * jnp.tanh(cn)
                return (hn, cn), hn

            init = (jnp.zeros((b, c), jnp.float32), jnp.zeros((b, c), jnp.float32))
            _, out = lax.scan(step, init, x_proj.transpose(1, 0, 2))
            h = out.transpose(1, 0, 2)
        return h + x


class EncodecEncoder(nnx.Module):
    """waveform (b, t, 1) -> latents (b, t/320, 128)."""

    def __init__(self, cfg: EncodecConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.layers = nnx.List()
        self.layers.append(CausalConv1d(cfg, cfg.audio_channels, cfg.num_filters,
                                        cfg.kernel_size, rngs=rngs))
        scaling = 1
        for ratio in reversed(tuple(cfg.upsampling_ratios)):
            cur = scaling * cfg.num_filters
            for j in range(cfg.num_residual_layers):
                self.layers.append(ResnetBlock1d(
                    cfg, cur, (cfg.dilation_growth_rate ** j, 1), rngs=rngs))
            self.layers.append(Elu())
            self.layers.append(CausalConv1d(cfg, cur, cur * 2, ratio * 2,
                                            stride=ratio, rngs=rngs))
            scaling *= 2
        self.layers.append(ResidualLSTM(scaling * cfg.num_filters,
                                        cfg.num_lstm_layers, rngs=rngs))
        self.layers.append(Elu())
        self.layers.append(CausalConv1d(cfg, scaling * cfg.num_filters,
                                        cfg.hidden_size, cfg.last_kernel_size,
                                        rngs=rngs))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            x = layer(x)
        return x


class EncodecDecoder(nnx.Module):
    """latents (b, n, 128) -> waveform (b, n*320, 1)."""

    def __init__(self, cfg: EncodecConfig, *, rngs: nnx.Rngs):
        self.cfg = cfg
        scaling = int(2 ** len(tuple(cfg.upsampling_ratios)))
        self.layers = nnx.List()
        self.layers.append(CausalConv1d(cfg, cfg.hidden_size,
                                        scaling * cfg.num_filters,
                                        cfg.kernel_size, rngs=rngs))
        self.layers.append(ResidualLSTM(scaling * cfg.num_filters,
                                        cfg.num_lstm_layers, rngs=rngs))
        for ratio in tuple(cfg.upsampling_ratios):
            cur = scaling * cfg.num_filters
            self.layers.append(Elu())
            self.layers.append(CausalConvTranspose1d(cfg, cur, cur // 2,
                                                     ratio * 2, stride=ratio,
                                                     rngs=rngs))
            for j in range(cfg.num_residual_layers):
                self.layers.append(ResnetBlock1d(
                    cfg, cur // 2, (cfg.dilation_growth_rate ** j, 1), rngs=rngs))
            scaling //= 2
        self.layers.append(Elu())
        self.layers.append(CausalConv1d(cfg, cfg.num_filters, cfg.audio_channels,
                                        cfg.last_kernel_size, rngs=rngs))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in self.layers:
            x = layer(x)
        return x


class ResidualVQ(nnx.Module):
    """Residual vector quantizer (codes <-> continuous latents)."""

    def __init__(self, cfg: EncodecConfig, *, rngs: nnx.Rngs):
        self.codebooks = nnx.Param(jax.random.normal(
            rngs.params(), (cfg.num_quantizers, cfg.codebook_size,
                            cfg.hidden_size), jnp.float32))

    def encode(self, latents: jnp.ndarray, num_quantizers: int) -> jnp.ndarray:
        """latents (b, n, d) -> codes (q, b, n)."""
        residual = latents
        codes = []
        for q in range(num_quantizers):
            cb = self.codebooks[...][q]                              # (K, d)
            d2 = (jnp.sum(residual ** 2, -1, keepdims=True)
                  - 2.0 * residual @ cb.T
                  + jnp.sum(cb ** 2, -1)[None, None, :])
            idx = jnp.argmin(d2, axis=-1)                            # (b, n)
            quant = cb[idx]
            residual = residual - quant
            codes.append(idx)
        return jnp.stack(codes)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (q, b, n) -> latents (b, n, d)."""
        out = 0.0
        for q in range(codes.shape[0]):
            out = out + self.codebooks[...][q][codes[q]]
        return out


class EncodecModel(nnx.Module):
    def __init__(self, cfg: EncodecConfig | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or EncodecConfig()
        self.encoder = EncodecEncoder(self.cfg, rngs=rngs)
        self.decoder = EncodecDecoder(self.cfg, rngs=rngs)
        self.quantizer = ResidualVQ(self.cfg, rngs=rngs)

    def encode(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(b, t) or (b, t, 1) -> (b, n, 128) continuous latents."""
        if waveform.ndim == 2:
            waveform = waveform[..., None]
        return self.encoder(waveform)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(b, n, 128) -> (b, t) waveform."""
        return self.decoder(latents)[..., 0]

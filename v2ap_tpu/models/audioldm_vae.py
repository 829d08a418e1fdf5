"""AudioLDM first-stage VAE (mel <-> latent) in JAX — the alternative
"vae" vocoder option of the reference (VaeWrapper,
e2_tts_crossatt3.py:443-490; vendored src/audioldm/variational_autoencoder).

LDM-style convolutional autoencoder over mel spectrograms treated as 1-ch
images (b, T, 64, 1): encoder/decoder ResNet blocks with GroupNorm(32) +
swish, one spatial self-attention at the bottleneck, 2x up/down stages. The
reference's serving path only needs ``decode`` (latent -> mel, then HiFi-GAN
to waveform); ``encode`` is provided for featurisation parity. The
``scale_factor`` multiplies latents exactly as the LDM checkpoint defines.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import nnx


@dataclasses.dataclass(frozen=True)
class AudioLDMVAEConfig:
    mel_bins: int = 64
    base_channels: int = 128
    channel_mults: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    latent_channels: int = 8
    scale_factor: float = 0.9227914
    groups: int = 32


def _gn(ch, groups, rngs):
    return nnx.GroupNorm(ch, num_groups=min(groups, ch),
                         param_dtype=jnp.float32, rngs=rngs)


class ResnetBlock(nnx.Module):
    def __init__(self, cin, cout, groups, *, rngs: nnx.Rngs):
        kw = dict(param_dtype=jnp.float32, rngs=rngs)
        self.norm1 = _gn(cin, groups, rngs)
        self.conv1 = nnx.Conv(cin, cout, (3, 3), padding="SAME", **kw)
        self.norm2 = _gn(cout, groups, rngs)
        self.conv2 = nnx.Conv(cout, cout, (3, 3), padding="SAME", **kw)
        self.shortcut = (nnx.Conv(cin, cout, (1, 1), **kw)
                         if cin != cout else None)

    def __call__(self, x):
        h = self.conv1(nnx.swish(self.norm1(x)))
        h = self.conv2(nnx.swish(self.norm2(h)))
        res = self.shortcut(x) if self.shortcut is not None else x
        return h + res


class AttnBlock(nnx.Module):
    def __init__(self, ch, groups, *, rngs: nnx.Rngs):
        kw = dict(param_dtype=jnp.float32, rngs=rngs)
        self.norm = _gn(ch, groups, rngs)
        self.q = nnx.Conv(ch, ch, (1, 1), **kw)
        self.k = nnx.Conv(ch, ch, (1, 1), **kw)
        self.v = nnx.Conv(ch, ch, (1, 1), **kw)
        self.proj = nnx.Conv(ch, ch, (1, 1), **kw)

    def __call__(self, x):
        b, h, w, c = x.shape
        hn = self.norm(x)
        q = self.q(hn).reshape(b, h * w, c)
        k = self.k(hn).reshape(b, h * w, c)
        v = self.v(hn).reshape(b, h * w, c)
        att = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", att, v).reshape(b, h, w, c)
        return x + self.proj(out)


class Downsample(nnx.Module):
    def __init__(self, ch, *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(ch, ch, (3, 3), strides=(2, 2),
                             padding=((0, 1), (0, 1)),
                             param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        return self.conv(x)


class Upsample(nnx.Module):
    def __init__(self, ch, *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(ch, ch, (3, 3), padding="SAME",
                             param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return self.conv(x)


class AudioLDMVAE(nnx.Module):
    def __init__(self, cfg: AudioLDMVAEConfig | None = None, *,
                 rngs: nnx.Rngs):
        self.cfg = cfg or AudioLDMVAEConfig()
        cfg = self.cfg
        g = cfg.groups
        kw = dict(param_dtype=jnp.float32, rngs=rngs)
        chs = [cfg.base_channels * m for m in cfg.channel_mults]

        # ----- encoder
        self.conv_in = nnx.Conv(1, chs[0], (3, 3), padding="SAME", **kw)
        self.down_blocks = nnx.List()
        self.downsamples = nnx.List()
        cin = chs[0]
        for i, ch in enumerate(chs):
            blocks = nnx.List()
            for _ in range(cfg.num_res_blocks):
                blocks.append(ResnetBlock(cin, ch, g, rngs=rngs))
                cin = ch
            self.down_blocks.append(blocks)
            self.downsamples.append(Downsample(ch, rngs=rngs)
                                    if i < len(chs) - 1 else None)
        self.mid1 = ResnetBlock(cin, cin, g, rngs=rngs)
        self.mid_attn = AttnBlock(cin, g, rngs=rngs)
        self.mid2 = ResnetBlock(cin, cin, g, rngs=rngs)
        self.enc_norm = _gn(cin, g, rngs)
        self.enc_out = nnx.Conv(cin, 2 * cfg.latent_channels, (3, 3),
                                padding="SAME", **kw)
        self.quant = nnx.Conv(2 * cfg.latent_channels,
                              2 * cfg.latent_channels, (1, 1), **kw)

        # ----- decoder
        self.post_quant = nnx.Conv(cfg.latent_channels, cfg.latent_channels,
                                   (1, 1), **kw)
        self.dec_in = nnx.Conv(cfg.latent_channels, chs[-1], (3, 3),
                               padding="SAME", **kw)
        self.dmid1 = ResnetBlock(chs[-1], chs[-1], g, rngs=rngs)
        self.dmid_attn = AttnBlock(chs[-1], g, rngs=rngs)
        self.dmid2 = ResnetBlock(chs[-1], chs[-1], g, rngs=rngs)
        self.up_blocks = nnx.List()
        self.upsamples = nnx.List()
        cin = chs[-1]
        for i, ch in enumerate(reversed(chs)):
            blocks = nnx.List()
            for _ in range(cfg.num_res_blocks + 1):
                blocks.append(ResnetBlock(cin, ch, g, rngs=rngs))
                cin = ch
            self.up_blocks.append(blocks)
            self.upsamples.append(Upsample(ch, rngs=rngs)
                                  if i < len(chs) - 1 else None)
        self.dec_norm = _gn(cin, g, rngs)
        self.dec_out = nnx.Conv(cin, 1, (3, 3), padding="SAME", **kw)

    # ---------------------------------------------------------------- api
    def encode(self, mel: jnp.ndarray, rng: jax.Array | None = None):
        """mel (b, T, mel_bins) -> latent (b, T/4, mel_bins/4, zc) (mean when
        rng is None, else a reparameterised sample), scaled."""
        x = mel[..., None].astype(jnp.float32)
        h = self.conv_in(x)
        for blocks, down in zip(self.down_blocks, self.downsamples):
            for blk in blocks:
                h = blk(h)
            if down is not None:
                h = down(h)
        h = self.mid2(self.mid_attn(self.mid1(h)))
        moments = self.quant(self.enc_out(nnx.swish(self.enc_norm(h))))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape)
        return mean * self.cfg.scale_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """latent (b, T/4, mel_bins/4, zc) -> mel (b, T, mel_bins)."""
        z = z.astype(jnp.float32) / self.cfg.scale_factor
        h = self.dec_in(self.post_quant(z))
        h = self.dmid2(self.dmid_attn(self.dmid1(h)))
        for blocks, up in zip(self.up_blocks, self.upsamples):
            for blk in blocks:
                h = blk(h)
            if up is not None:
                h = up(h)
        return self.dec_out(nnx.swish(self.dec_norm(h)))[..., 0]


class VaeVocoder(nnx.Module):
    """latent -> mel (VAE) -> waveform (HiFi-GAN): the reference VaeWrapper
    decode path, with the flat (b, d, l) latent layout it uses
    (e2_tts_crossatt3.py:484-490: (b, l, 8, 16) reshape)."""

    def __init__(self, vae: AudioLDMVAE | None = None, vocoder=None, *,
                 rngs: nnx.Rngs):
        from v2ap_tpu.models.hifigan import HiFiGANGenerator
        self.vae = vae or AudioLDMVAE(rngs=rngs)
        self.vocoder = vocoder or HiFiGANGenerator(rngs=rngs)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(b, l, 128) flat latents -> waveform (b, t)."""
        b, l, d = latents.shape
        zc = self.vae.cfg.latent_channels
        z = latents.reshape(b, l, zc, d // zc).transpose(0, 1, 3, 2)
        mel = self.vae.decode(z)
        return self.vocoder(mel)

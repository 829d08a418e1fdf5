"""Alternative vocoder stack: HiFi-GAN generator and AudioLDM VAE."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from v2ap_tpu.models.audioldm_vae import (
    AudioLDMVAE, AudioLDMVAEConfig, VaeVocoder,
)
from v2ap_tpu.models.hifigan import HiFiGANConfig, HiFiGANGenerator
from v2ap_tpu.utils.jitting import create_model

TINY_HIFI = HiFiGANConfig(in_channels=8, upsample_initial_channel=32,
                          upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                          resblock_kernel_sizes=(3,),
                          resblock_dilations=((1, 3),))
TINY_VAE = AudioLDMVAEConfig(mel_bins=8, base_channels=8,
                             channel_mults=(1, 2), num_res_blocks=1,
                             latent_channels=2, groups=4)


def test_hifigan_upsampling_factor():
    gen = create_model(lambda: HiFiGANGenerator(TINY_HIFI, rngs=nnx.Rngs(0)))
    mel = jnp.zeros((2, 10, 8))
    wav = nnx.jit(lambda m, x: m(x))(gen, mel)
    assert wav.shape == (2, 10 * 8)        # hop = 4*2
    assert float(jnp.abs(wav).max()) <= 1.0


def test_hifigan_default_hop():
    assert HiFiGANConfig().hop_length == 160


def test_vae_roundtrip_shapes():
    vae = create_model(lambda: AudioLDMVAE(TINY_VAE, rngs=nnx.Rngs(0)))
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 8)),
                      jnp.float32)
    z = nnx.jit(lambda m, x: m.encode(x))(vae, mel)
    assert z.shape == (1, 8, 4, 2)         # /2 per stage, zc=2
    rec = nnx.jit(lambda m, z: m.decode(z))(vae, z)
    assert rec.shape == (1, 16, 8)
    assert bool(jnp.isfinite(rec).all())


def test_vae_sampled_encode_differs():
    vae = create_model(lambda: AudioLDMVAE(TINY_VAE, rngs=nnx.Rngs(0)))
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 8)),
                      jnp.float32)
    mean = vae.encode(mel)
    samp = vae.encode(mel, rng=jax.random.key(0))
    assert not np.allclose(np.asarray(mean), np.asarray(samp))


def test_vae_vocoder_flat_latents():
    vae = create_model(lambda: AudioLDMVAE(TINY_VAE, rngs=nnx.Rngs(0)))
    gen = create_model(lambda: HiFiGANGenerator(TINY_HIFI, rngs=nnx.Rngs(1)))
    voc = VaeVocoder(vae, gen, rngs=nnx.Rngs(2))
    # flat latents (b, l, zc * w) with w = mel_bins/4... here 2*4=8
    lat = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8)),
                      jnp.float32)
    wav = nnx.jit(lambda m, z: m.decode(z))(voc, lat)
    assert wav.ndim == 2 and wav.shape[0] == 1
    assert bool(jnp.isfinite(wav).all())

"""Vocos mel vocoder: ISTFT overlap-add correctness, torch parity of the
ConvNeXt-1d backbone + ISTFT head, and converter round-trip."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from v2ap_tpu.models.vocos import (
    Vocos, VocosConfig, istft, vocos_tiny_test, _hann,
)
from v2ap_tpu.utils.jitting import create_model
from v2ap_tpu.utils.torch_convert import load_vocos_from_state_dict


def naive_istft(spec: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Loop-and-scatter reference for the shifted-sum OLA."""
    b, frames, _ = spec.shape
    win = _hann(n_fft)
    total = (frames - 1) * hop + n_fft
    out = np.zeros((b, total))
    env = np.zeros(total)
    for t in range(frames):
        td = np.fft.irfft(spec[:, t], n=n_fft) * win
        out[:, t * hop: t * hop + n_fft] += td
        env[t * hop: t * hop + n_fft] += win ** 2
    out = out / np.maximum(env, 1e-11)
    half = n_fft // 2
    return out[:, half: total - half]


def test_istft_matches_naive_overlap_add(rng):
    n_fft, hop, frames = 32, 8, 11
    spec = (rng.normal(size=(2, frames, n_fft // 2 + 1))
            + 1j * rng.normal(size=(2, frames, n_fft // 2 + 1)))
    got = np.asarray(istft(jnp.asarray(spec, jnp.complex64), n_fft, hop))
    want = naive_istft(spec, n_fft, hop)
    assert got.shape == (2, (frames - 1) * hop)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_istft_roundtrips_stft_frames(rng):
    """rFFT of windowed frames -> istft recovers the signal away from edges
    (hann COLA at 75% overlap)."""
    n_fft, hop = 16, 4
    t = 30 * hop
    sig = rng.normal(size=(1, t + n_fft)).astype(np.float32)
    frames = np.stack([sig[0, i * hop: i * hop + n_fft]
                       for i in range(30)])[None]
    spec = np.fft.rfft(frames * _hann(n_fft), axis=-1)
    rec = np.asarray(istft(jnp.asarray(spec, jnp.complex64), n_fft, hop))
    want = sig[:, n_fft // 2: n_fft // 2 + rec.shape[1]]
    np.testing.assert_allclose(rec, want, atol=1e-4)


def test_vocos_decode_shape_and_finite(rng):
    cfg = vocos_tiny_test()
    model = create_model(lambda: Vocos(cfg, rngs=nnx.Rngs(0)))
    mel = jnp.asarray(rng.normal(size=(2, 12, cfg.input_channels)),
                      jnp.float32)
    wav = nnx.jit(lambda m, x: m.decode(x))(model, mel)
    assert wav.shape == (2, 11 * cfg.hop_length)
    assert bool(jnp.isfinite(wav).all())
    # channels-first input (the reference passes (b, c, t) latents, :2283)
    wav2 = nnx.jit(lambda m, x: m.decode(x))(model, jnp.swapaxes(mel, 1, 2))
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-6)


def _torch_vocos(cfg: VocosConfig, seed: int):
    """The charactr/vocos architecture assembled from torch primitives
    (vocos/models.py ConvNeXtBlock + heads.ISTFTHead), as the parity
    reference."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(seed)
    nn = torch.nn

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.dwconv = nn.Conv1d(cfg.dim, cfg.dim, 7, padding=3,
                                    groups=cfg.dim)
            self.norm = nn.LayerNorm(cfg.dim, eps=cfg.layer_norm_eps)
            self.pwconv1 = nn.Linear(cfg.dim, cfg.intermediate_dim)
            self.pwconv2 = nn.Linear(cfg.intermediate_dim, cfg.dim)
            self.gamma = nn.Parameter(
                torch.full((cfg.dim,), 1.0 / cfg.num_layers))

        def forward(self, x):             # (b, c, t)
            res = x
            x = self.dwconv(x).transpose(1, 2)
            x = self.norm(x)
            x = self.pwconv2(torch.nn.functional.gelu(self.pwconv1(x)))
            return res + (self.gamma * x).transpose(1, 2)

    class TorchVocos(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = nn.Module()
            self.backbone.embed = nn.Conv1d(cfg.input_channels, cfg.dim, 7,
                                            padding=3)
            self.backbone.norm = nn.LayerNorm(cfg.dim, eps=cfg.layer_norm_eps)
            self.backbone.convnext = nn.ModuleList(
                [Block() for _ in range(cfg.num_layers)])
            self.backbone.final_layer_norm = nn.LayerNorm(
                cfg.dim, eps=cfg.layer_norm_eps)
            self.head = nn.Module()
            self.head.out = nn.Linear(cfg.dim, cfg.n_fft + 2)

        def forward(self, mel):           # (b, c, t) -> (b, samples)
            x = self.backbone.embed(mel)
            x = self.backbone.norm(x.transpose(1, 2)).transpose(1, 2)
            for blk in self.backbone.convnext:
                x = blk(x)
            x = self.backbone.final_layer_norm(x.transpose(1, 2))
            out = self.head.out(x)
            mag, p = out.chunk(2, dim=-1)
            mag = torch.exp(mag).clamp(max=1e2)
            spec = torch.complex(mag * torch.cos(p), mag * torch.sin(p))
            win = torch.hann_window(cfg.n_fft)
            return torch.istft(spec.transpose(1, 2), cfg.n_fft,
                               hop_length=cfg.hop_length, win_length=cfg.n_fft,
                               window=win, center=True)

    return TorchVocos().eval()


def test_vocos_torch_parity(rng):
    torch = pytest.importorskip("torch")
    cfg = VocosConfig(input_channels=6, dim=12, intermediate_dim=24,
                      num_layers=2, n_fft=16, hop_length=4)
    tmodel = _torch_vocos(cfg, seed=0)
    jmodel = create_model(lambda: Vocos(cfg, rngs=nnx.Rngs(0)))
    load_vocos_from_state_dict(tmodel.state_dict(), jmodel)

    mel = rng.normal(size=(2, cfg.input_channels, 13)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel)).numpy()
    got = np.asarray(nnx.jit(lambda m, x: m.decode(x))(
        jmodel, jnp.asarray(mel)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_vocos_full_size_config():
    cfg = vocos_mel = VocosConfig()
    assert vocos_mel.input_channels == 100 and cfg.dim == 512
    assert cfg.n_fft == 1024 and cfg.hop_length == 256
    assert cfg.sampling_rate == 24_000

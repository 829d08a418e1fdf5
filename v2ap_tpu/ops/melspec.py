"""Log-mel spectrogram in pure JAX (the reference's legacy ``MelSpec`` path,
e2_tts_crossatt3.py:375-417: 1024 fft / 256 hop / 100 mels / 24 kHz, log with
1e-5 floor). Shipped checkpoints use EnCodec latents instead, but the mel
featurizer remains a public model option (``num_channels=100`` configs).

Framing + matmul formulation: frames x window -> rFFT -> |.| -> mel filter
matmul (MXU) -> log. All static shapes, jittable.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def hz_to_mel_slaney(f):
    """librosa's default (htk=False) scale: linear below 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    mel = f / (200.0 / 3.0)
    log_step = np.log(6.4) / 27.0
    return np.where(f >= 1000.0, 15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                    / log_step, mel)


def mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    log_step = np.log(6.4) / 27.0
    return np.where(m >= 15.0, 1000.0 * np.exp(log_step * (m - 15.0)),
                    m * (200.0 / 3.0))


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr: int = 24_000, n_fft: int = 1024, n_mels: int = 100,
                   fmin: float = 0.0, fmax: float | None = None,
                   slaney_norm: bool = False,
                   slaney_scale: bool = False) -> np.ndarray:
    """Triangular mel filterbank (n_mels, n_fft//2+1). ``slaney_norm`` applies
    librosa's area normalisation (the TacotronSTFT/AudioLDM convention,
    reference src/audioldm/audio/stft.py:136); without it, torchaudio's
    ``norm=None`` default. ``slaney_scale`` switches the HTK mel formula to
    librosa's default Slaney scale (PANN/torchlibrosa convention)."""
    fmax = fmax or sr / 2.0
    to_mel = hz_to_mel_slaney if slaney_scale else hz_to_mel
    to_hz = mel_to_hz_slaney if slaney_scale else mel_to_hz
    mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_pts = to_hz(mel_pts)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)), np.float32)
    for i in range(n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    if slaney_norm:
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        fb *= enorm[:, None].astype(np.float32)
    return fb


def tacotron_mel(waveform, sr: int = 16_000, n_fft: int = 1024,
                 hop: int = 160, win_length: int = 1024, n_mels: int = 64,
                 fmin: float = 0.0, fmax: float = 8_000.0):
    """AudioLDM's TacotronSTFT featurisation: slaney-normalised mel with
    dynamic-range compression log(clip(x, 1e-5)) at 16 kHz / hop 160."""
    return melspectrogram(waveform, sr=sr, n_fft=n_fft, hop=hop,
                          win_length=win_length, n_mels=n_mels, power=1.0,
                          log_floor=1e-5, fmin=fmin, fmax=fmax,
                          slaney_norm=True)


def melspectrogram(
    waveform: jnp.ndarray,            # (b, t)
    sr: int = 24_000,
    n_fft: int = 1024,
    hop: int = 256,
    win_length: int | None = None,
    n_mels: int = 100,
    power: float = 1.0,
    log_floor: float = 1e-5,
    center: bool = True,
    fmin: float = 0.0,
    fmax: float | None = None,
    slaney_norm: bool = False,
) -> jnp.ndarray:
    """-> (b, frames, n_mels) log-mel."""
    win_length = win_length or n_fft
    if center:
        pad = n_fft // 2
        waveform = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
    b, t = waveform.shape
    frames = 1 + (t - n_fft) // hop
    idx = jnp.arange(frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    segs = waveform[:, idx]                                   # (b, frames, n_fft)
    window = jnp.asarray(np.hanning(win_length + 1)[:-1], jnp.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(segs * window, axis=-1)
    mag = jnp.abs(spec) ** power
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, slaney_norm))
    mel = jnp.einsum("bfk,mk->bfm", mag.astype(jnp.float32), fb)
    return jnp.log(jnp.clip(mel, log_floor, None))

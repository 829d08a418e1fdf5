"""Host-side audio IO: wav decode, resampling, normalisation, max-energy
segment selection, length shaping.

Re-designed from the reference's torchaudio-based loader
(torch_tools.py:206-365): numpy + scipy polyphase resampling (the native C++
fast path in ``v2ap_tpu/native`` is used when built), with the same
behavioral contract — 24 kHz mono, mean-removed peak-normalised to 0.5,
max-energy window selection at hop granularity, pad-by-repetition.
"""

from __future__ import annotations

import math
import os
import wave
from fractions import Fraction

import numpy as np

SAMPLE_RATE = 24_000
HOP_SIZE = 320
TARGET_FRAMES = 750          # 10 s of 75 Hz latent frames


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV file -> (float32 (ch, n) in [-1, 1], sample_rate).

    Native C++ fast path when the v2ap_native library is built; otherwise a
    pure-stdlib RIFF reader. 16/24/32-bit PCM and float32 supported; other
    containers should be transcoded offline or decoded via cv2 in video_io.
    """
    from v2ap_tpu import native
    if native.available():
        with open(path, "rb") as f:
            out = native.wav_decode(f.read())
        if out is not None:
            return out
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        val = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
               | (b[:, 2].astype(np.int32) << 16))
        val = np.where(val >= 1 << 23, val - (1 << 24), val)
        data = val.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported wav sample width {width} in {path}")
    return data.reshape(-1, ch).T.copy(), sr


def write_wav(path: str, audio: np.ndarray, sr: int = SAMPLE_RATE) -> None:
    """float32 (n,) or (ch, n) -> 16-bit PCM WAV."""
    if audio.ndim == 1:
        audio = audio[None]
    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with wave.open(path, "wb") as w:
        w.setnchannels(pcm.shape[0])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.T.tobytes())


def resample(audio: np.ndarray, sr: int, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Polyphase resampling (ch, n) -> (ch, m)."""
    if sr == target_sr:
        return audio
    from scipy.signal import resample_poly
    frac = Fraction(target_sr, sr).limit_denominator(1000)
    return resample_poly(audio, frac.numerator, frac.denominator,
                         axis=-1).astype(np.float32)


def normalize_wav(audio: np.ndarray) -> np.ndarray:
    """Mean-removal + peak normalisation to 0.5 (reference torch_tools /
    e2_tts_crossatt3.py:93-96)."""
    audio = audio - audio.mean()
    audio = audio / (np.abs(audio[0]).max() + 1e-8)
    return (audio * 0.5).astype(np.float32)


def pad_or_repeat(audio: np.ndarray, length: int) -> np.ndarray:
    """Tile short clips to fill ``length`` samples, truncate long ones."""
    n = audio.shape[-1]
    if n >= length:
        return audio[..., :length]
    reps = math.ceil(length / n)
    return np.tile(audio, (1, reps))[..., :length]


def frame_energy(audio: np.ndarray, hop: int = HOP_SIZE) -> np.ndarray:
    """(1, n) -> per-hop mean |x| energies."""
    n = audio.shape[-1] // hop
    return np.abs(audio[0, : n * hop]).reshape(n, hop).mean(axis=1)


def select_max_energy_segment(audio: np.ndarray, target_frames: int,
                              hop: int = HOP_SIZE) -> np.ndarray:
    """Sliding-window max-energy crop at hop granularity
    (reference torch_tools.py:346-365, rewritten as a vectorised prefix-sum;
    C++ fast path when the native library is built)."""
    total = audio.shape[-1] // hop
    if total <= target_frames:
        return pad_or_repeat(audio, target_frames * hop)
    from v2ap_tpu import native
    if native.available():
        start = native.max_energy_start(
            np.ascontiguousarray(audio[0]), hop, target_frames)
        if start is not None:
            return audio[..., start * hop: (start + target_frames) * hop]
    e = frame_energy(audio, hop)
    csum = np.concatenate([[0.0], np.cumsum(e)])
    window = csum[target_frames:] - csum[:-target_frames]   # sums of windows
    start = int(np.argmax(window[: total - target_frames + 1]))
    return audio[..., start * hop: (start + target_frames) * hop]


def load_training_clip(path: str, target_frames: int = TARGET_FRAMES,
                       val: bool = False, rng: np.random.Generator | None = None,
                       ) -> np.ndarray | None:
    """Full loader contract of the reference's ``read_wav_file``: decode,
    resample to 24 kHz mono, normalise, choose the max-energy (train) or
    leading (val) window of ``target_frames`` hops. Returns (1, n) or None."""
    try:
        audio, sr = read_wav(path)
    except Exception:
        return None
    audio = audio.mean(axis=0, keepdims=True) if audio.shape[0] > 1 else audio
    audio = resample(audio, sr)
    if not np.isfinite(audio).all() or np.abs(audio).max() < 1e-6:
        return None
    audio = normalize_wav(audio)
    length = target_frames * HOP_SIZE
    if val:
        return pad_or_repeat(audio, length)
    audio = pad_or_repeat(audio, max(length, audio.shape[-1]))
    return select_max_energy_segment(audio, target_frames)

"""CLAP-score audio/caption filtering interface.

The reference gates training clips by a CLAP text-audio similarity score per
corpus (torch_tools.py:163-203, ``do_clap_filter``; the actual model loads
are commented out in the shipped code, :16-27 — filtering ran in their data
preparation). Here the mechanism is a pluggable scorer:

    set_scorer(fn)           # fn(waveform_16k: np.ndarray, caption: str) -> float
    passes(waveform, sr, caption, threshold)  -> (score, keep)

Corpus thresholds come from ``CorpusSpec.score_threshold`` (manifests.py),
replacing the reference's +/-9999 sentinel encoding. Without a scorer every
clip passes (score None), matching the shipped default.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

_SCORER: Optional[Callable[[np.ndarray, str], float]] = None

CLAP_SAMPLE_RATE = 48_000


def set_scorer(fn: Optional[Callable[[np.ndarray, str], float]]) -> None:
    global _SCORER
    _SCORER = fn


def has_scorer() -> bool:
    return _SCORER is not None


def score(waveform: np.ndarray, sr: int, caption: str) -> Optional[float]:
    """waveform (1, n) at ``sr`` -> CLAP similarity or None if no scorer."""
    if _SCORER is None:
        return None
    from v2ap_tpu.data.audio_io import resample
    wav = resample(waveform, sr, CLAP_SAMPLE_RATE)[0]
    return float(_SCORER(wav, caption))


def passes(waveform: np.ndarray, sr: int, caption: str,
           threshold: Optional[float]) -> Tuple[Optional[float], bool]:
    """-> (score, keep). Sentinel-free: threshold None disables filtering."""
    if threshold is None or _SCORER is None:
        return None, True
    s = score(waveform, sr, caption)
    return s, s is None or s >= threshold

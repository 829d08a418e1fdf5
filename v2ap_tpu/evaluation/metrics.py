"""Audio quality evaluation: Frechet Audio Distance (FAD), CLAP similarity,
and the per-clip realtime-factor report.

The reference defers audio eval to the external "AudioLDM Eval" toolkit
(README.md:77, SURVEY §4). Here the FAD math is native and exact (Frechet
distance between gaussian embedding statistics, with a symmetric-sqrtm via
eigendecomposition); the embedding model is pluggable (VGGish/PANN/CLAP
weights live outside this repo — register any callable
``embed(waveform_batch, sr) -> (n, d)``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

_EMBEDDER: Optional[Callable] = None


def set_embedder(fn: Optional[Callable]) -> None:
    global _EMBEDDER
    _EMBEDDER = fn


def embedding_stats(embeddings: np.ndarray):
    """(n, d) -> (mu (d,), sigma (d, d))."""
    mu = embeddings.mean(axis=0)
    sigma = np.cov(embeddings, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Symmetric PSD matrix square root via eigendecomposition."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FD between two gaussians: |mu1-mu2|^2 + tr(S1 + S2 - 2 (S1 S2)^1/2)."""
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(sigma1)
    cov_prod_sqrt = _sqrtm_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2.0 * np.trace(cov_prod_sqrt))


def fad_from_embeddings(ref: np.ndarray, gen: np.ndarray) -> float:
    mu1, s1 = embedding_stats(ref)
    mu2, s2 = embedding_stats(gen)
    return frechet_distance(mu1, s1, mu2, s2)


def default_embedder() -> Callable:
    """Registers-and-returns the built-in PANN Cnn14 embedder (JAX; weights
    from ``$V2AP_PANN_WEIGHTS`` when set, deterministic seed-0 init
    otherwise — convert the published Cnn14 checkpoint for absolute FAD)."""
    global _EMBEDDER
    if _EMBEDDER is None:
        from v2ap_tpu.evaluation.pann import make_embedder
        _EMBEDDER = make_embedder()
    return _EMBEDDER


def fad(reference_wavs: Sequence[np.ndarray], generated_wavs: Sequence[np.ndarray],
        sr: int = 24_000, embedder: Optional[Callable] = None) -> float:
    """Frechet Audio Distance between two waveform collections, using the
    built-in PANN Cnn14 embedder unless one is registered/passed."""
    fn = embedder or _EMBEDDER or default_embedder()
    ref = np.concatenate([np.atleast_2d(fn(w, sr)) for w in reference_wavs])
    gen = np.concatenate([np.atleast_2d(fn(w, sr)) for w in generated_wavs])
    return fad_from_embeddings(ref, gen)


def clap_similarity(waveform: np.ndarray, sr: int, caption: str) -> Optional[float]:
    """Text-audio CLAP score through the data-pipeline scorer registry."""
    from v2ap_tpu.data import clap_filter
    return clap_filter.score(waveform[None] if waveform.ndim == 1 else waveform,
                             sr, caption)

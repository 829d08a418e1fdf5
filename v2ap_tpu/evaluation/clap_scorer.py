"""CLAP audio-text scorer factory: wires ``models.clap.ClapModel`` into the
data pipeline's filter registry (``data.clap_filter.set_scorer``) and the
eval metrics' ``clap_similarity``.

The reference filters training clips by CLAP score thresholds
(torch_tools.py:163-203) with a vendored ~10.6 kLoC CLAP package; here the
tower is the JAX port (parity-tested vs HF ClapModel) and the scorer is a
thin jitted closure.

Weights: ``$V2AP_CLAP_WEIGHTS`` may point at an orbax dir produced by
``scripts/convert_checkpoints.py --clap`` (from laion/clap-htsat-unfused).
Without weights the scorer still runs (seed-0 init) — scores are then only
useful for plumbing tests, not for real filtering.

Tokenizer: RoBERTa BPE when ``$V2AP_CLAP_TOKENIZER`` points at an HF
tokenizer dir; otherwise the deterministic hash fallback (stable ids, pad=1,
bos=0, eos=2 — the RoBERTa special-token convention).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _fallback_tokenize(captions, vocab_size: int, max_len: int = 64):
    import hashlib
    b = len(captions)
    ids = np.full((b, max_len), 1, np.int32)          # pad id 1
    mask = np.zeros((b, max_len), np.int32)
    for i, text in enumerate(captions):
        words = text.split()[: max_len - 2]
        ids[i, 0] = 0                                  # <s>
        for j, w in enumerate(words):
            h = int(hashlib.md5(w.lower().encode()).hexdigest(), 16)
            ids[i, j + 1] = h % (vocab_size - 3) + 3
        ids[i, len(words) + 1] = 2                     # </s>
        mask[i, : len(words) + 2] = 1
    return ids, mask


def make_clap_scorer(audio_cfg=None, text_cfg=None,
                     weights_path: Optional[str] = None,
                     tokenizer_path: Optional[str] = None):
    """-> ``scorer(wav_48k: np.ndarray, caption: str) -> float`` (cosine),
    the signature ``data.clap_filter.set_scorer`` expects."""
    import jax.numpy as jnp
    from flax import nnx
    from v2ap_tpu.models.clap import (
        ClapModel, clap_htsat_unfused, clap_logmel)
    from v2ap_tpu.utils.jitting import create_model

    if audio_cfg is None or text_cfg is None:
        audio_cfg, text_cfg = clap_htsat_unfused()
    model = create_model(lambda: ClapModel(audio_cfg, text_cfg,
                                           rngs=nnx.Rngs(0)))
    weights_path = weights_path or os.environ.get("V2AP_CLAP_WEIGHTS")
    if weights_path:
        from v2ap_tpu.utils.checkpoint import load_model
        load_model(weights_path, model)

    tokenizer_path = tokenizer_path or os.environ.get("V2AP_CLAP_TOKENIZER")
    if tokenizer_path and os.path.exists(tokenizer_path):
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(tokenizer_path)

        def tokenize(captions):
            out = tok(list(captions), padding=True, truncation=True,
                      max_length=64, return_tensors="np")
            return (out["input_ids"].astype(np.int32),
                    out["attention_mask"].astype(np.int32))
    else:
        def tokenize(captions):
            return _fallback_tokenize(captions, text_cfg.vocab_size)

    sim = nnx.jit(lambda m, f, i, k: m.similarity(f, i, k))
    tmax = audio_cfg.spec_size * audio_cfg.freq_ratio

    def scorer(wav_48k: np.ndarray, caption: str) -> float:
        feats = clap_logmel(np.atleast_2d(wav_48k),
                            n_mels=audio_cfg.num_mel_bins)
        if feats.shape[2] > tmax:
            feats = feats[:, :, :tmax]             # 10 s window
        ids, mask = tokenize([caption])
        s = sim(model, jnp.asarray(feats), jnp.asarray(ids),
                jnp.asarray(mask))
        return float(np.asarray(s)[0])

    return scorer

"""Text tokenizers for the TTS-side path.

The reference configures three tokenizer families (e2_tts_crossatt3.py:
177-289): UTF-8 bytes, English g2p phonemes, and a Chinese jieba/pypinyin
phoneme scheme (1342 symbols). The shipped V2A/V2P configs bypass
tokenization entirely (the text stream carries CLIP embeddings), so here the
byte tokenizer is fully implemented and the phoneme tokenizers are provided
behind availability gates (g2p_en / jieba / pypinyin are not in this image —
they load if installed, otherwise raise a clear error at construction).
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import numpy as np

PAD_ID = -1


def byte_tokenizer() -> Tuple[Callable[[List[str]], np.ndarray], int]:
    """UTF-8 byte tokenizer; pad with -1 (reference list_str_to_tensor)."""

    def encode(texts: List[str]) -> np.ndarray:
        rows = [list(t.encode("utf-8")) for t in texts]
        n = max((len(r) for r in rows), default=1)
        out = np.full((len(rows), n), PAD_ID, np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    return encode, 256


def phoneme_en_tokenizer() -> Tuple[Callable[[List[str]], np.ndarray], int]:
    """English g2p phoneme tokenizer (requires the optional g2p_en package)."""
    try:
        from g2p_en import G2p
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "phoneme_en tokenizer requires g2p_en; install it or use "
            "tokenizer='char_utf8'") from exc
    g2p = G2p()
    phoneme_to_index = dict(g2p.p2idx)
    extras = [" ", ",", ".", "-", "!", "?", "'", '"']
    for i, ch in enumerate(extras):
        phoneme_to_index[ch] = len(g2p.p2idx) + i

    def encode(texts: List[str]) -> np.ndarray:
        rows = [[phoneme_to_index[p] for p in g2p(t) if p in phoneme_to_index]
                for t in texts]
        n = max((len(r) for r in rows), default=1)
        out = np.full((len(rows), n), PAD_ID, np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    return encode, len(phoneme_to_index)


def phoneme_zh_tokenizer() -> Tuple[Callable[[List[str]], np.ndarray], int]:
    """Chinese pinyin phoneme tokenizer (requires jieba + pypinyin)."""
    try:
        import jieba  # noqa: F401
        from pypinyin import Style, lazy_pinyin  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "phoneme_zh tokenizer requires jieba and pypinyin; install them "
            "or use tokenizer='char_utf8'") from exc

    import jieba
    from pypinyin import Style, lazy_pinyin

    puncs = ["，", "。", "？", "、"]
    letters = list("abcdefghijklmnopqrstuvwxyz") + ["'", " "]
    uppers = list("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
    vocab: dict = {}
    for p in puncs:
        vocab.setdefault(p, len(vocab))
    # pinyin space is enumerated lazily: unseen syllables get new ids up to cap
    base = len(vocab)
    for i, ch in enumerate(letters + uppers):
        vocab[ch] = base + 1300 + i

    def encode(texts: List[str]) -> np.ndarray:
        rows = []
        for t in texts:
            row = []
            for word in jieba.cut(t):
                if all("一" <= c <= "鿿" for c in word):
                    for syl in lazy_pinyin(word, style=Style.TONE3,
                                           tone_sandhi=True):
                        row.append(vocab.setdefault(syl, len(vocab)))
                else:
                    for ch in word:
                        if ch in vocab:
                            row.append(vocab[ch])
            rows.append(row)
        n = max((len(r) for r in rows), default=1)
        out = np.full((len(rows), n), PAD_ID, np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    return encode, 1342


def get_tokenizer(name: str):
    if name == "char_utf8":
        return byte_tokenizer()
    if name == "phoneme_en":
        return phoneme_en_tokenizer()
    if name == "phoneme_zh":
        return phoneme_zh_tokenizer()
    raise ValueError(f"unknown tokenizer '{name}'")

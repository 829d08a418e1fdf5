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


ZH_PUNCS = ["，", "。", "？", "、"]
ZH_LETTERS = list("abcdefghijklmnopqrstuvwxyz") + ["'", " "]
ZH_UPPERS = list("ABCDEFGHIJKLMNOPQRSTUVWXYZ")
ZH_NUM_PHONEMES = 1342


def zh_phoneme_table() -> dict:
    """The reference's vendored 1342-symbol scheme
    (e2_tts_crossatt3.py:230-257): 4 CJK punctuation marks, 1310 toned pinyin
    syllables (shipped in ``zh_pinyin_table.json``), 28 ascii symbols.
    Uppercase letters deliberately share ids with lowercase — the reference
    assigns both from the same offset, and published checkpoints were trained
    with that mapping."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "zh_pinyin_table.json")
    with open(path) as f:
        pinyins = json.load(f)
    table: dict = {}
    for i, p in enumerate(ZH_PUNCS):
        table[p] = i
    base = len(ZH_PUNCS)
    for i, p in enumerate(pinyins):
        table[p] = base + i
    base += len(pinyins)
    for i, ch in enumerate(ZH_LETTERS):
        table[ch] = base + i
    for i, ch in enumerate(ZH_UPPERS):
        table[ch] = base + i               # case-insensitive (see docstring)
    assert base + len(ZH_LETTERS) == ZH_NUM_PHONEMES
    return table


def zh_tokens_to_ids(tokens: List[str], table: dict) -> List[int]:
    """Pre-segmented symbols (pinyin syllables / letters / puncs) -> ids.
    Works with no optional packages — the decode-time path."""
    out = []
    for tok in tokens:
        if tok in table:
            out.append(table[tok])
        elif all(c in table for c in tok):     # ascii word -> per character
            out.extend(table[c] for c in tok)
        else:
            raise KeyError(f"symbol {tok!r} not in the zh phoneme table")
    return out


def phoneme_zh_tokenizer() -> Tuple[Callable[[List[str]], np.ndarray], int]:
    """Chinese pinyin phoneme tokenizer over the vendored 1342-symbol table.

    Raw Chinese text additionally needs jieba + pypinyin for segmentation
    (exactly the reference pipeline, :258-286); input that is already pinyin
    syllables / ascii works without them via ``zh_tokens_to_ids``.
    """
    table = zh_phoneme_table()
    try:
        import jieba
        from pypinyin import Style, lazy_pinyin
        have_zh = True
    except ImportError:  # pragma: no cover - env-dependent
        have_zh = False

    def tokenize(t: str) -> List[int]:
        if not have_zh:
            return zh_tokens_to_ids(t.split(" ") if any(
                len(tok) > 1 for tok in t.split(" ")) else list(t), table)
        row: List[int] = []
        for word in jieba.cut(t):
            if all("一" <= c <= "鿿" for c in word):
                for syl in lazy_pinyin(word, style=Style.TONE3,
                                       tone_sandhi=True):
                    if syl in table:
                        row.append(table[syl])
            else:
                for ch in word:
                    if ch in table:
                        row.append(table[ch])
        return row

    def encode(texts: List[str]) -> np.ndarray:
        rows = [tokenize(t) for t in texts]
        n = max((len(r) for r in rows), default=1)
        out = np.full((len(rows), n), PAD_ID, np.int32)
        for i, r in enumerate(rows):
            out[i, : len(r)] = r
        return out

    return encode, ZH_NUM_PHONEMES


def get_tokenizer(name: str):
    if name == "char_utf8":
        return byte_tokenizer()
    if name == "phoneme_en":
        return phoneme_en_tokenizer()
    if name == "phoneme_zh":
        return phoneme_zh_tokenizer()
    raise ValueError(f"unknown tokenizer '{name}'")

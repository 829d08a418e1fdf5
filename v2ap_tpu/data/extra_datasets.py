"""Additional dataset adapters completing the reference's L1 inventory:

* ``HFAudioDataset`` — HuggingFace ``datasets`` audio corpora -> latent
  batches (reference HFDataset, trainer...3.py:87-132: per-example decode
  with 0.3-20 s duration gating, skipping out-of-bound examples).
* ``TextToSpeechDataset`` — TTS scp corpora ("wav|transcript" rows) with the
  reference's multi=8 oversampling (trainer...3.py:1381-1455); tokenization
  goes through ``data.tokenizers``.

Both are optional-host-side; the HF adapter gates on the ``datasets``
package.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import numpy as np

from v2ap_tpu.data.audio_io import HOP_SIZE, normalize_wav, pad_or_repeat, resample


class HFAudioDataset:
    def __init__(self, dataset, *, sample_rate: int = 24_000,
                 min_seconds: float = 0.3, max_seconds: float = 20.0,
                 audio_key: str = "audio", text_key: str = "text"):
        self.ds = dataset
        self.sample_rate = sample_rate
        self.min_s = min_seconds
        self.max_s = max_seconds
        self.audio_key = audio_key
        self.text_key = text_key

    @classmethod
    def from_hub(cls, name: str, split: str = "train", **kw):
        try:
            import datasets
        except ImportError as exc:  # pragma: no cover
            raise ImportError("HFAudioDataset requires the 'datasets' "
                              "package") from exc
        return cls(datasets.load_dataset(name, split=split), **kw)

    def __len__(self) -> int:
        return len(self.ds)

    def get(self, index: int) -> Optional[Tuple[np.ndarray, str]]:
        """-> (waveform (1, n) @ 24 kHz, caption) or None if out of bounds."""
        row = self.ds[int(index)]
        audio = row[self.audio_key]
        arr = np.asarray(audio["array"], np.float32)[None]
        sr = int(audio["sampling_rate"])
        dur = arr.shape[-1] / sr
        if not (self.min_s <= dur <= self.max_s):
            return None
        arr = resample(arr, sr, self.sample_rate)
        return normalize_wav(arr), str(row.get(self.text_key, ""))

    def batches(self, batch_size: int, target_frames: int = 750,
                seed: int = 0) -> Iterator[dict]:
        rng = np.random.default_rng(seed)
        n_samples = target_frames * HOP_SIZE
        while True:
            wavs, caps = [], []
            while len(wavs) < batch_size:
                item = self.get(int(rng.integers(len(self.ds))))
                if item is None:
                    continue                     # skip-and-redraw (reference)
                wav, cap = item
                wavs.append(pad_or_repeat(wav, n_samples)[0])
                caps.append(cap)
            yield {"waveforms": np.stack(wavs),
                   "lens": np.full((batch_size,), target_frames, np.int32),
                   "captions": caps}


class TextToSpeechDataset:
    """scp rows ``wav_path|transcript`` (or tab-separated) with oversampling."""

    def __init__(self, scp_path: str, *, multi: int = 8,
                 tokenizer: str = "char_utf8"):
        from v2ap_tpu.data.tokenizers import get_tokenizer
        self.rows: List[Tuple[str, str]] = []
        with open(scp_path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line:
                    continue
                sep = "|" if "|" in line else "\t"
                parts = line.split(sep, 1)
                self.rows.append((parts[0], parts[1] if len(parts) > 1 else ""))
        self.multi = multi
        self.encode, self.vocab_size = get_tokenizer(tokenizer)

    def __len__(self) -> int:
        return len(self.rows) * self.multi

    def batches(self, batch_size: int, target_frames: int = 750,
                seed: int = 0) -> Iterator[dict]:
        from v2ap_tpu.data.audio_io import load_training_clip
        rng = np.random.default_rng(seed)
        while True:
            wavs, texts = [], []
            attempts = 0
            while len(wavs) < batch_size and attempts < 16 * batch_size:
                attempts += 1
                path, text = self.rows[int(rng.integers(len(self.rows)))]
                clip = load_training_clip(path, target_frames)
                if clip is None:
                    continue
                wavs.append(clip[0])
                texts.append(text)
            if not wavs:
                return
            tokens = self.encode(texts)
            yield {"waveforms": np.stack(wavs),
                   "lens": np.full((len(wavs),), target_frames, np.int32),
                   "tokens": tokens, "texts": texts}

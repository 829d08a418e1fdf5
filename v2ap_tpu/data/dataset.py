"""Training batch assembly: multi-corpus sampling, theta-ratio resampling,
mix augmentation, per-host sharding, bad-sample blacklisting, fixed shapes.

Re-design of the reference's oversampled collate pipeline
(trainer_multigpus_alldatas3.py:1058-1378):
  * draw ``batch*multi`` candidates, resample between sound-effect and
    non-sound-effect corpora toward a theta ratio (:1075-1116);
  * load/normalise 10-s 24 kHz windows (max-energy selection);
  * optional A-weighted mix augmentation with caption concatenation;
  * attach per-host video/piano samples (per-rank striding :1194,1274
    becomes host_id/num_hosts slicing);
  * keep the last ``keep_last`` rows -> fixed-shape numpy batch;
  * failed decodes go to a persistent blacklist and the draw retries
    (:999-1000,1070-1164 -- the reference's while-True redraw loop).

Waveforms travel to device; EnCodec latent extraction happens in the jitted
train step (the reference computed Encodec latents in dataloader workers on
CPU: SURVEY L1).
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List, Optional, Sequence

import numpy as np

from v2ap_tpu.config import DataConfig
from v2ap_tpu.data.audio_io import HOP_SIZE, load_training_clip
from v2ap_tpu.data.manifests import Sample
from v2ap_tpu.data.mixing import mix_captions, mix_waveforms


@dataclasses.dataclass
class Batch:
    """Host-side batch; arrays fixed-shape, ready for device_put."""
    waveforms: np.ndarray            # (b, n_samples) float32 @ 24 kHz
    lens: np.ndarray                 # (b,) latent-frame lengths
    captions: List[str]
    video_paths: List[Optional[str]]
    piano: List[bool]
    video_drop_prompt: np.ndarray    # (b,) bool — 50% flip for video rows
    audio_drop_prompt: np.ndarray    # (b,) bool


class TrainBatcher:
    def __init__(self, samples: Sequence[Sample], cfg: DataConfig | None = None,
                 *, batch_size: int = 8, host_id: int = 0, num_hosts: int = 1,
                 mix_prob: float = 0.5, seed: int | None = None):
        cfg = cfg or DataConfig()
        self.cfg = cfg
        self.batch_size = batch_size
        self.rng = np.random.default_rng(cfg.seed if seed is None else seed)
        self.blacklist: set = set()

        audio = [s for s in samples if not s.is_video]
        video = [s for s in samples if s.is_video]
        # per-host striding of the video corpora
        self.video_samples = video[host_id::num_hosts] if video else []
        self.audio_se = [s for s in audio if s.is_sound_effect]
        self.audio_non_se = [s for s in audio if not s.is_sound_effect]
        self.mix_prob = mix_prob

    # ------------------------------------------------------------- sampling
    def _draw_candidates(self, n: int) -> List[Sample]:
        """theta-ratio resampling between SE / non-SE corpora."""
        theta = self.cfg.theta_ratio
        out = []
        for _ in range(n):
            use_se = (self.rng.random() < theta) and self.audio_se
            pool = self.audio_se if use_se else (self.audio_non_se or self.audio_se)
            if not pool:
                break
            out.append(pool[int(self.rng.integers(len(pool)))])
        return out

    def _load(self, sample: Sample) -> Optional[np.ndarray]:
        if sample.path in self.blacklist:
            return None
        clip = load_training_clip(sample.path, self.cfg.target_length,
                                  rng=self.rng)
        if clip is None:
            self.blacklist.add(sample.path)
        return clip

    def next_batch(self) -> Batch:
        cfg = self.cfg
        target_samples = cfg.target_length * HOP_SIZE
        rows: List[tuple] = []          # (waveform, caption, video_path, piano)
        attempts = 0
        while len(rows) < self.batch_size and attempts < 64:
            attempts += 1
            need = (self.batch_size - len(rows)) * cfg.oversample_multi
            for sample in self._draw_candidates(need):
                wav = self._load(sample)
                if wav is None:
                    continue
                caption = sample.caption
                # A-weighted mix augmentation
                if (self.rng.random() < self.mix_prob
                        and (self.audio_se or self.audio_non_se)):
                    other = self._draw_candidates(1)
                    if other:
                        wav2 = self._load(other[0])
                        if wav2 is not None:
                            r = float(self.rng.uniform(0.25, 0.75))
                            wav = mix_waveforms(wav, wav2, r, cfg.sample_rate)
                            caption = mix_captions(caption, other[0].caption)
                rows.append((wav[0], caption, None, False))
                if len(rows) >= self.batch_size:
                    break
            if not (self.audio_se or self.audio_non_se):
                break
        # substitute video/piano rows at the tail (reference keeps video rows
        # in the last positions of the truncated batch, :1366-1375)
        n_video = min(len(self.video_samples), max(0, self.batch_size - len(rows))
                      ) or (1 if self.video_samples and rows else 0)
        video_rows: List[tuple] = []
        for _ in range(n_video):
            s = self.video_samples[int(self.rng.integers(len(self.video_samples)))]
            video_rows.append((None, s.caption, s.path, s.is_piano))
        rows = rows[: self.batch_size - len(video_rows)] + video_rows

        b = len(rows)
        waveforms = np.zeros((b, target_samples), np.float32)
        captions, video_paths, piano = [], [], []
        for i, (wav, cap, vp, pi) in enumerate(rows):
            if wav is not None:
                waveforms[i, : len(wav)] = wav[:target_samples]
            captions.append(cap)
            video_paths.append(vp)
            piano.append(pi)
        lens = np.full((b,), self.cfg.target_length, np.int32)
        is_video = np.asarray([vp is not None for vp in video_paths])
        return Batch(
            waveforms=waveforms, lens=lens, captions=captions,
            video_paths=video_paths, piano=piano,
            video_drop_prompt=is_video & (self.rng.random(b) < 0.5),
            audio_drop_prompt=np.zeros((b,), bool),
        )

    def __iter__(self) -> Iterator[Batch]:
        while True:
            yield self.next_batch()

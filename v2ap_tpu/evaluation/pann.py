"""PANN CNN14 audio embedder in JAX — the default Frechet-Audio-Distance
embedding model.

The reference defers audio eval to "AudioLDM Eval" (README.md:77), whose FAD
uses the PANN Cnn14 checkpoint; porting it makes the framework's FAD
self-contained (round-1 VERDICT missing #3). Structure follows the published
PANN implementation (Kong et al., "PANNs: Large-Scale Pretrained Audio
Neural Networks", arXiv 1912.10211):

  waveform -> power spectrogram (hann, center/reflect) -> Slaney-scale,
  Slaney-normalised log-mel (librosa convention) -> bn0 over mel bins ->
  6 conv blocks (2x [3x3 conv, BN, relu], 2x2 avg pool; 64..2048 channels)
  -> mean over mel axis -> (max+mean) time pooling -> fc1+relu = the 2048-d
  "embedding" consumed by FAD.

Weights: ``load_pann_from_state_dict`` maps the published ``Cnn14*.pth``
state-dict names. Without weights the embedder initialises from a fixed seed
(deterministic; fine for regression tests, NOT comparable across codebases —
convert the real checkpoint for absolute FAD numbers).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import nnx

from v2ap_tpu.ops.melspec import mel_filterbank


@dataclasses.dataclass(frozen=True)
class PannConfig:
    sample_rate: int = 16_000
    n_fft: int = 512
    win_length: int = 512
    hop: int = 160
    n_mels: int = 64
    fmin: float = 50.0
    fmax: float = 8_000.0
    embed_dim: int = 2048
    num_classes: int = 527            # AudioSet tagging head (fc_audioset)
    amin: float = 1e-10
    dtype: str = "float32"


def pann_16k() -> PannConfig:
    """Cnn14_16k — the AudioLDM-Eval FAD checkpoint."""
    return PannConfig()


def pann_32k() -> PannConfig:
    """The original Cnn14 (32 kHz, window 1024, hop 320, fmax 14 kHz)."""
    return PannConfig(sample_rate=32_000, n_fft=1024, win_length=1024,
                      hop=320, fmax=14_000.0)


def pann_tiny_test() -> PannConfig:
    return PannConfig(embed_dim=32, num_classes=10)


def pann_logmel(waveform: jnp.ndarray, cfg: PannConfig) -> jnp.ndarray:
    """(b, t) -> (b, frames, n_mels): torchlibrosa-convention log-mel
    (power spectrogram, Slaney mel, power_to_db with ref=1, no top_db)."""
    pad = cfg.n_fft // 2
    x = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
    b, t = x.shape
    frames = 1 + (t - cfg.n_fft) // cfg.hop
    idx = jnp.arange(frames)[:, None] * cfg.hop + jnp.arange(cfg.n_fft)[None, :]
    segs = x[:, idx]
    window = jnp.asarray(np.hanning(cfg.win_length + 1)[:-1], jnp.float32)
    spec = jnp.fft.rfft(segs * window, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                    cfg.fmin, cfg.fmax, slaney_norm=True,
                                    slaney_scale=True))
    mel = jnp.einsum("bfk,mk->bfm", power.astype(jnp.float32), fb)
    return 10.0 * jnp.log10(jnp.clip(mel, cfg.amin, None))


class PannConvBlock(nnx.Module):
    def __init__(self, cin: int, cout: int, *, dtype, rngs: nnx.Rngs):
        kw = dict(use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                  rngs=rngs)
        bn_kw = dict(use_running_average=True, dtype=jnp.float32,
                     param_dtype=jnp.float32, rngs=rngs)
        self.conv1 = nnx.Conv(cin, cout, (3, 3), padding=((1, 1), (1, 1)), **kw)
        self.bn1 = nnx.BatchNorm(cout, **bn_kw)
        self.conv2 = nnx.Conv(cout, cout, (3, 3), padding=((1, 1), (1, 1)), **kw)
        self.bn2 = nnx.BatchNorm(cout, **bn_kw)

    def __call__(self, x):                        # (b, t, m, c) NHWC
        x = nnx.relu(self.bn1(self.conv1(x)))
        x = nnx.relu(self.bn2(self.conv2(x)))
        from jax import lax
        out = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                                "VALID")
        return out / 4.0


class Cnn14(nnx.Module):
    """waveform (b, t) -> 2048-d embedding (b, embed_dim)."""

    def __init__(self, cfg: PannConfig | None = None, *, rngs: nnx.Rngs):
        self.cfg = cfg or pann_16k()
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        widths = [64, 128, 256, 512, 1024, cfg.embed_dim]
        self.bn0 = nnx.BatchNorm(cfg.n_mels, use_running_average=True,
                                 dtype=jnp.float32, param_dtype=jnp.float32,
                                 rngs=rngs)
        blocks = []
        cin = 1
        for cout in widths:
            blocks.append(PannConvBlock(cin, cout, dtype=dtype, rngs=rngs))
            cin = cout
        self.blocks = nnx.List(blocks)
        self.fc1 = nnx.Linear(cfg.embed_dim, cfg.embed_dim, dtype=dtype,
                              param_dtype=jnp.float32, rngs=rngs)
        # AudioSet tagging head: clipwise logits over 527 event classes
        # (sigmoid'ed in the published model; kept as logits here so both
        # the softmax-KL and sigmoid-KL eval conventions can use them)
        self.fc_audioset = nnx.Linear(cfg.embed_dim, cfg.num_classes,
                                      dtype=dtype, param_dtype=jnp.float32,
                                      rngs=rngs)

    def __call__(self, waveform: jnp.ndarray) -> jnp.ndarray:
        mel = pann_logmel(waveform, self.cfg)          # (b, t, m)
        # PANN's bn0 normalises across mel bins (the torch code transposes
        # mel into the channel axis; here BN acts on the trailing axis)
        mel = self.bn0(mel)
        x = mel[..., None]                             # (b, t, m, 1)
        for blk in self.blocks:
            x = blk(x)
        x = jnp.mean(x, axis=2)                        # (b, t', c) mel-mean
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)   # time pooling
        return nnx.relu(self.fc1(x)).astype(jnp.float32)

    def logits(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """(b, t) -> (b, num_classes) clipwise AudioSet logits (no dropout:
        inference path of the published Cnn14)."""
        return self.fc_audioset(self(waveform)).astype(jnp.float32)


def load_pann_from_state_dict(sd: dict, jmodel: Cnn14) -> None:
    """Published ``Cnn14*.pth`` state dict (numpy/torch tensors) -> Cnn14."""
    def arr(v):
        return jnp.asarray(np.asarray(getattr(v, "detach", lambda: v)()
                                      if hasattr(v, "detach") else v))

    def bn(jmod, key):
        jmod.scale[...] = arr(sd[f"{key}.weight"])
        jmod.bias[...] = arr(sd[f"{key}.bias"])
        jmod.mean[...] = arr(sd[f"{key}.running_mean"])
        jmod.var[...] = arr(sd[f"{key}.running_var"])

    bn(jmodel.bn0, "bn0")
    for i, blk in enumerate(jmodel.blocks, start=1):
        p = f"conv_block{i}"
        w = arr(sd[f"{p}.conv1.weight"])               # (out, in, kh, kw)
        blk.conv1.kernel[...] = jnp.transpose(w, (2, 3, 1, 0))
        bn(blk.bn1, f"{p}.bn1")
        w = arr(sd[f"{p}.conv2.weight"])
        blk.conv2.kernel[...] = jnp.transpose(w, (2, 3, 1, 0))
        bn(blk.bn2, f"{p}.bn2")
    jmodel.fc1.kernel[...] = arr(sd["fc1.weight"]).T
    jmodel.fc1.bias[...] = arr(sd["fc1.bias"])
    if "fc_audioset.weight" in sd:                 # tagging head (IS / KL)
        jmodel.fc_audioset.kernel[...] = arr(sd["fc_audioset.weight"]).T
        jmodel.fc_audioset.bias[...] = arr(sd["fc_audioset.bias"])


def _build_cnn14(cfg: PannConfig | None, weights_path: str | None):
    """Shared constructor: Cnn14 from ``weights_path`` /
    ``$V2AP_PANN_WEIGHTS`` (its ``model`` sub-dict is the state dict), or a
    fixed seed-0 init."""
    import os
    from v2ap_tpu.utils.jitting import create_model

    cfg = cfg or pann_16k()
    model = create_model(lambda: Cnn14(cfg, rngs=nnx.Rngs(0)))
    weights_path = weights_path or os.environ.get("V2AP_PANN_WEIGHTS")
    if weights_path:
        import torch
        ckpt = torch.load(weights_path, map_location="cpu")
        load_pann_from_state_dict(ckpt.get("model", ckpt), model)
    return cfg, model


def _wrap_forward(cfg: PannConfig, model: Cnn14, method):
    fwd = nnx.jit(method)

    def run(waveform: np.ndarray, sr: int):
        from v2ap_tpu.data.audio_io import resample
        wav = np.atleast_2d(np.asarray(waveform, np.float32))
        if sr != cfg.sample_rate:
            wav = resample(wav, sr, cfg.sample_rate)
        out = fwd(model, jnp.asarray(wav))
        return (tuple(np.asarray(o) for o in out) if isinstance(out, tuple)
                else np.asarray(out))

    return run


def make_embedder(cfg: PannConfig | None = None, weights_path: str | None = None):
    """Build ``embed(waveform, sr) -> (n, embed_dim)`` for evaluation.fad."""
    cfg, model = _build_cnn14(cfg, weights_path)
    return _wrap_forward(cfg, model, lambda m, w: m(w))


def make_classifier(cfg: PannConfig | None = None,
                    weights_path: str | None = None):
    """Build ``classify(waveform, sr) -> (n, num_classes)`` clipwise AudioSet
    logits for the IS / KL metrics (same Cnn14 checkpoint as the embedder)."""
    cfg, model = _build_cnn14(cfg, weights_path)
    return _wrap_forward(cfg, model, lambda m, w: m.logits(w))


def make_joint(cfg: PannConfig | None = None, weights_path: str | None = None):
    """Build ``joint(waveform, sr) -> (embeddings, logits)`` sharing ONE
    Cnn14 and ONE backbone pass — the logits are a single Linear past the
    embedding, so FAD + IS + KL pipelines should use this instead of
    separate embedder/classifier calls."""
    cfg, model = _build_cnn14(cfg, weights_path)

    def both(m, w):
        emb = m(w)
        return emb, m.fc_audioset(emb).astype(jnp.float32)

    return _wrap_forward(cfg, model, both)

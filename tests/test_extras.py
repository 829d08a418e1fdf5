"""DurationPredictor, tokenizers, MelSpec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.data.tokenizers import byte_tokenizer, get_tokenizer
from v2ap_tpu.models.duration import DurationPredictor
from v2ap_tpu.ops.melspec import melspectrogram, mel_filterbank
from v2ap_tpu.utils.jitting import create_model


def test_byte_tokenizer():
    enc, vocab = byte_tokenizer()
    out = enc(["hi", "abc"])
    assert vocab == 256
    assert out.shape == (2, 3)
    assert out[0].tolist() == [104, 105, -1]
    assert out[1].tolist() == [97, 98, 99]


def test_get_tokenizer_unknown():
    with pytest.raises(ValueError):
        get_tokenizer("nope")


def test_duration_predictor_forward_and_loss():
    mc = cfglib.tiny_test().model
    model = create_model(lambda: DurationPredictor(mc, rngs=nnx.Rngs(0)))
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(2, 24, mc.num_channels)), jnp.float32)
    tokens = jnp.asarray([[104, 105, -1], [97, 98, 99]], jnp.int32)
    lens = jnp.asarray([20, 24])
    pred = nnx.jit(lambda m, l, t, le: m(l, t, le))(model, latents, tokens, lens)
    assert pred.shape == (2,)
    assert bool(jnp.all(pred >= 0))           # softplus head
    loss = nnx.jit(lambda m, l, t, le, r: m.loss(l, t, le, r))(
        model, latents, tokens, lens, jax.random.key(0))
    assert np.isfinite(float(loss))


def test_mel_filterbank_shape():
    fb = mel_filterbank(24_000, 1024, 100)
    assert fb.shape == (100, 513)
    assert (fb >= 0).all()
    # every frequency bin inside the range is covered by some filter
    assert fb[:, 5:-5].sum(axis=0).min() > 0


def test_melspectrogram_vs_torchaudio():
    torch = pytest.importorskip("torch")
    torchaudio = pytest.importorskip("torchaudio")
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(1, 24_000)).astype(np.float32) * 0.3
    mel = np.asarray(melspectrogram(jnp.asarray(wav)))
    t_mel = torchaudio.transforms.MelSpectrogram(
        sample_rate=24_000, n_fft=1024, hop_length=256, n_mels=100,
        power=1)(torch.from_numpy(wav))
    t_mel = torch.log(torch.clamp(t_mel, min=1e-5)).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(mel, t_mel, rtol=1e-2, atol=1e-2)


def test_melspectrogram_shape_only():
    wav = jnp.zeros((2, 24_000))
    mel = melspectrogram(wav)
    assert mel.shape[0] == 2 and mel.shape[2] == 100
    # log floor for silence
    np.testing.assert_allclose(np.asarray(mel), np.log(1e-5), atol=1e-4)

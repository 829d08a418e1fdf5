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


def test_interpolated_character_embed():
    from v2ap_tpu.models.duration import InterpolatedCharacterEmbed
    emb = create_model(lambda: InterpolatedCharacterEmbed(8, rngs=nnx.Rngs(0)))
    tokens = jnp.asarray([[5, 9, 2, -1, -1], [7, -1, -1, -1, -1]], jnp.int32)
    out = emb(tokens, 12)
    assert out.shape == (2, 12, 8)
    assert bool(jnp.isfinite(out).all())
    # masked variant zeroes the padding rows
    mask = jnp.asarray([[True] * 6 + [False] * 6, [True] * 12])
    out2 = emb(tokens, 12, mask=mask)
    np.testing.assert_allclose(np.asarray(out2[0, 6:]), 0.0, atol=1e-7)


def test_piano_coords_registry(tmp_path):
    from v2ap_tpu.audeo import piano_coords as pc
    pc.register("vid1", (10, 60, 0, 200))
    assert pc.get("vid1") == (10, 60, 0, 200)
    path = str(tmp_path / "coords.json")
    pc.save_registry(path)
    pc._REGISTRY.clear()
    assert pc.load_registry(path) >= 1
    frames = np.zeros((3, 100, 300, 3), np.uint8)
    cropped = pc.crop_keyboard(frames, pc.get("vid1"))
    assert cropped.shape == (3, 50, 200, 3)


def test_tacotron_mel_shape():
    from v2ap_tpu.ops.melspec import tacotron_mel
    wav = jnp.zeros((1, 16_000))
    mel = tacotron_mel(wav)
    assert mel.shape[0] == 1 and mel.shape[2] == 64


def test_clap_filter_interface():
    from v2ap_tpu.data import clap_filter as cf
    s, keep = cf.passes(np.zeros((1, 1000), np.float32), 24_000, "x", 0.3)
    assert keep and s is None            # no scorer -> everything passes
    cf.set_scorer(lambda wav, cap: 0.9 if "dog" in cap else 0.1)
    try:
        s, keep = cf.passes(np.zeros((1, 1000), np.float32), 24_000,
                            "dog barks", 0.3)
        assert keep and s == 0.9
        s, keep = cf.passes(np.zeros((1, 1000), np.float32), 24_000,
                            "cat", 0.3)
        assert not keep and s == 0.1
    finally:
        cf.set_scorer(None)


def test_roll2midi_infer(tmp_path):
    import jax.numpy as jnp2

    class FakeGen:
        def __call__(self, x):
            return x                      # identity "cleanup"

    rng = np.random.default_rng(0)
    logits = [rng.normal(size=(50, 88)).astype(np.float32) * 3 for _ in range(4)]
    from v2ap_tpu.audeo.datasets import roll2midi_infer
    outs = roll2midi_infer(FakeGen(), logits, out_dir=str(tmp_path / "midi"))
    assert len(outs) == 4
    assert outs[0].shape == (50, 88)
    import os
    assert os.path.exists(str(tmp_path / "midi" / "0-50.npz"))
    assert outs[0][:, :15].sum() == 0


def test_frechet_distance_identity_and_shift():
    from v2ap_tpu.evaluation.metrics import (
        fad_from_embeddings, frechet_distance, embedding_stats)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(500, 8))
    assert abs(fad_from_embeddings(a, a.copy())) < 1e-6
    b = a + 3.0                                   # mean shift of 3 per dim
    d = fad_from_embeddings(a, b)
    np.testing.assert_allclose(d, 8 * 9.0, rtol=0.05)
    # scale mismatch also contributes
    c = a * 2.0
    assert fad_from_embeddings(a, c) > 0.5


def test_fad_with_custom_embedder():
    """An explicitly registered embedder overrides the built-in PANN default
    (the default itself is covered in tests/test_fad.py)."""
    from v2ap_tpu.evaluation import metrics
    metrics.set_embedder(lambda w, sr: np.asarray([[w.mean(), w.std()]]))
    try:
        val = metrics.fad([np.random.default_rng(0).normal(size=1000)
                           for _ in range(8)],
                          [np.random.default_rng(1).normal(size=1000) * 1.1
                           for _ in range(8)])
        assert np.isfinite(val) and val >= 0
    finally:
        metrics.set_embedder(None)


def test_predictor_tiny(tmp_path):
    from predict import Predictor
    from tests.test_pipeline import write_synthetic_video
    video = str(tmp_path / "p.mp4")
    if not write_synthetic_video(video, frames=6, fps=4):
        pytest.skip("cv2 writer unavailable")
    p = Predictor(tiny=True)
    p.setup()
    out = p.predict(video, "ping", v2a_num_steps=2,
                    out_dir=str(tmp_path / "out"))
    import os
    assert os.path.exists(out)
    assert out.endswith(".wav") or out.endswith(".mp4")


def test_assert_deterministic():
    from v2ap_tpu.utils.determinism import assert_deterministic, tree_finite_report
    f = jax.jit(lambda x: jnp.tanh(x) * 2)
    assert_deterministic(f, jnp.ones((4, 4)))

    class Counter:
        n = 0
        def __call__(self, x):
            Counter.n += 1
            return x + Counter.n
    with pytest.raises(AssertionError):
        assert_deterministic(Counter(), jnp.zeros(3))

    bad = tree_finite_report({"a": jnp.ones(3), "b": jnp.asarray([jnp.nan])})
    assert len(bad) == 1 and "b" in bad[0]


def test_zh_phoneme_table_vendored():
    """The 1342-symbol zh scheme works with no jieba/pypinyin installed
    (vendored table; reference e2_tts_crossatt3.py:230-257), including the
    reference's case-insensitive letter ids."""
    from v2ap_tpu.data.tokenizers import (
        ZH_NUM_PHONEMES, zh_phoneme_table, zh_tokens_to_ids,
        phoneme_zh_tokenizer)
    table = zh_phoneme_table()
    assert ZH_NUM_PHONEMES == 1342
    assert max(table.values()) == 1341
    assert table["，"] == 0
    assert table["a1"] == 5                  # puncs(4) then pinyins
    assert table["A"] == table["a"]          # reference collision preserved
    assert table[" "] == 1341
    ids = zh_tokens_to_ids(["ni3", "hao3", "OK"], table)
    assert ids[:2] == [table["ni3"], table["hao3"]]
    assert ids[2:] == [table["o"], table["k"]]
    enc, vocab = phoneme_zh_tokenizer()
    assert vocab == 1342
    out = enc(["ni3 hao3"])
    assert out.shape[0] == 1 and (out >= 0).sum() >= 2


def test_piano_coords_reference_defaults():
    """The reference's actual 24+3 crop boxes ship as the default registry
    (reference src/audeo/piano_coords.py:1-8)."""
    from v2ap_tpu.audeo import piano_coords as pc
    assert pc.get("train_00") == (674, 863, 68, 1869)   # (t, b, l, r)
    assert pc.get("test_02") == (671, 871, 40, 1879)
    assert len(pc.reference_boxes("train")) == 24
    assert len(pc.reference_boxes("test")) == 3
    assert pc.reference_boxes("train")[0] == (68, 674, 1869, 863)


def test_int8_quantized_linears():
    """AQT int8 dot_general swap: outputs stay close to f32 (DRQ error only)
    and the swap actually changes the compute path."""
    from v2ap_tpu.models.clip_vit import CLIPVisionModel, clip_tiny_test
    from v2ap_tpu.utils.jitting import create_model
    from v2ap_tpu.utils.quantize import quantize_linears_int8

    cfg = clip_tiny_test()
    m1 = create_model(lambda: CLIPVisionModel(cfg, rngs=nnx.Rngs(0)))
    m2 = create_model(lambda: CLIPVisionModel(cfg, rngs=nnx.Rngs(0)))
    n = quantize_linears_int8(m2)
    assert n > 0
    px = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32))
    fwd = nnx.jit(lambda m, x: m(x))
    o1 = np.asarray(fwd(m1, px))
    o2 = np.asarray(fwd(m2, px))
    assert not np.allclose(o1, o2)                  # int8 path engaged
    # relative error bounded (tiny net, dynamic-range int8)
    rel = np.abs(o1 - o2).mean() / (np.abs(o1).mean() + 1e-9)
    assert rel < 0.1, rel

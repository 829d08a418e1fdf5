"""CLAP scorer (HTSAT Swin audio tower + RoBERTa text tower): torch parity
vs HF ClapModel on tiny configs, plus the clap_filter integration
(round-1 VERDICT missing #4; reference src/audioldm/clap/ +
torch_tools.py:163-203)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from v2ap_tpu.models.clap import (
    ClapModel, clap_logmel, clap_tiny_test,
)
from v2ap_tpu.utils.jitting import create_model


def _hf_tiny(torch):
    from transformers import ClapConfig as HFClapConfig
    from transformers.models.clap.configuration_clap import (
        ClapAudioConfig as HFAudio, ClapTextConfig as HFText,
    )
    a, t = clap_tiny_test()
    hf_audio = HFAudio(
        spec_size=a.spec_size, num_mel_bins=a.num_mel_bins,
        patch_size=a.patch_size, patch_stride=[a.patch_stride, a.patch_stride],
        patch_embeds_hidden_size=a.patch_embeds_hidden_size,
        depths=list(a.depths), num_attention_heads=list(a.num_heads),
        window_size=a.window_size, mlp_ratio=a.mlp_ratio,
        hidden_size=a.num_features,       # pooled width = last-stage dim
        enable_fusion=False, drop_path_rate=0.0,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        projection_dim=a.projection_dim, hidden_act="gelu")
    hf_text = HFText(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        num_hidden_layers=t.num_layers, num_attention_heads=t.num_heads,
        intermediate_size=t.intermediate_size,
        max_position_embeddings=t.max_position_embeddings,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        hidden_act="gelu", projection_dim=t.projection_dim)
    cfg = HFClapConfig.from_text_audio_configs(
        hf_text, hf_audio, projection_dim=a.projection_dim)
    from transformers import ClapModel as HFClapModel
    torch.manual_seed(0)
    return HFClapModel(cfg).eval(), (a, t)


def _jax_from_hf(tmodel, cfgs):
    from v2ap_tpu.utils.torch_convert import load_clap_from_torch
    a, t = cfgs
    jmodel = create_model(lambda: ClapModel(a, t, rngs=nnx.Rngs(0)))
    load_clap_from_torch(tmodel, jmodel)
    return jmodel


@pytest.fixture(scope="module")
def models():
    torch = pytest.importorskip("torch")
    tmodel, cfgs = _hf_tiny(torch)
    return torch, tmodel, _jax_from_hf(tmodel, cfgs), cfgs


def test_clap_audio_parity(models):
    torch, tmodel, jmodel, (a, _) = models
    rng = np.random.default_rng(0)
    # exact-size log-mel input (time = spec_size * freq_ratio, mels)
    feats = rng.normal(size=(2, 1, a.spec_size * a.freq_ratio,
                             a.num_mel_bins)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel.get_audio_features(
            input_features=torch.from_numpy(feats)).numpy()
    j_out = np.asarray(nnx.jit(lambda m, f: m.get_audio_features(f))(
        jmodel, jnp.asarray(feats)))
    t_out = t_out / np.linalg.norm(t_out, axis=-1, keepdims=True)
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-4)


def test_clap_text_parity(models):
    torch, tmodel, jmodel, _ = models
    ids = np.asarray([[0, 7, 9, 12, 2, 1, 1], [0, 5, 2, 1, 1, 1, 1]],
                     np.int64)
    mask = (ids != 1).astype(np.int64)
    with torch.no_grad():
        t_out = tmodel.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
    j_out = np.asarray(nnx.jit(lambda m, i, k: m.get_text_features(i, k))(
        jmodel, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
    t_out = t_out / np.linalg.norm(t_out, axis=-1, keepdims=True)
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-4)


def test_clap_similarity_and_logmel(models):
    torch, tmodel, jmodel, (a, _) = models
    wav = np.random.default_rng(0).normal(size=48_000).astype(np.float32)
    feats = clap_logmel(wav, n_mels=a.num_mel_bins)
    assert feats.shape[1] == 1 and feats.shape[3] == a.num_mel_bins
    # trim/pad time to the expected width
    tmax = a.spec_size * a.freq_ratio
    feats = feats[:, :, :tmax]
    ids = jnp.asarray([[0, 4, 8, 2]], jnp.int32)
    mask = jnp.ones_like(ids)
    sim = np.asarray(jmodel.similarity(jnp.asarray(feats), ids, mask))
    assert sim.shape == (1,) and np.all(np.abs(sim) <= 1.0 + 1e-5)


def test_clap_filter_scorer_integration():
    """make_clap_scorer registers into data.clap_filter so the training
    pipeline's threshold filtering becomes functional end to end."""
    from v2ap_tpu.data import clap_filter
    from v2ap_tpu.evaluation.clap_scorer import make_clap_scorer

    a, t = clap_tiny_test()
    scorer = make_clap_scorer(audio_cfg=a, text_cfg=t)
    clap_filter.set_scorer(scorer)
    try:
        wav = np.random.default_rng(0).normal(size=(1, 24_000)
                                              ).astype(np.float32)
        s = clap_filter.score(wav, 24_000, "a dog barking")
        assert s is not None and -1.0 <= s <= 1.0
        score, keep = clap_filter.passes(wav, 24_000, "a dog barking", -1.0)
        assert keep and score == s
    finally:
        clap_filter.set_scorer(None)

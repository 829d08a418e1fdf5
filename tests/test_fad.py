"""PANN Cnn14 FAD embedder: converter mapping, torch-parity of the conv
stack, and self-contained fad() (round-1 VERDICT missing #3)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from v2ap_tpu.evaluation.pann import (
    Cnn14, load_pann_from_state_dict, make_embedder, pann_logmel,
    pann_tiny_test,
)
from v2ap_tpu.utils.jitting import create_model


def test_logmel_shapes_and_range():
    cfg = pann_tiny_test()
    wav = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 16_000)).astype(np.float32))
    mel = pann_logmel(wav, cfg)
    assert mel.shape == (2, 1 + 16_000 // cfg.hop, cfg.n_mels)
    assert np.isfinite(np.asarray(mel)).all()


def _torch_cnn14(torch, sd, cfg):
    """Minimal torch replica of the PANN conv stack (published Cnn14
    structure) used to cross-check conv/BN/pool orientation."""
    import torch.nn.functional as F

    def conv_bn(x, p, i):
        w = sd[f"{p}.conv{i}.weight"]
        x = F.conv2d(x, w, padding=1)
        x = F.batch_norm(x, sd[f"{p}.bn{i}.running_mean"],
                         sd[f"{p}.bn{i}.running_var"],
                         sd[f"{p}.bn{i}.weight"], sd[f"{p}.bn{i}.bias"])
        return F.relu(x)

    def forward(mel):                      # mel (b, t, m)
        x = mel[:, None]                   # (b, 1, t, m)
        x = x.transpose(1, 3)              # (b, m, t, 1): bn0 over mel bins
        x = F.batch_norm(x, sd["bn0.running_mean"], sd["bn0.running_var"],
                         sd["bn0.weight"], sd["bn0.bias"])
        x = x.transpose(1, 3)              # back to (b, 1, t, m)
        for i in range(1, 7):
            p = f"conv_block{i}"
            x = conv_bn(x, p, 1)
            x = conv_bn(x, p, 2)
            x = F.avg_pool2d(x, 2)
        x = torch.mean(x, dim=3)           # mel-mean -> (b, c, t')
        x = torch.max(x, dim=2)[0] + torch.mean(x, dim=2)
        x = F.relu(F.linear(x, sd["fc1.weight"], sd["fc1.bias"]))
        return x

    return forward


def _synthetic_state_dict(torch, cfg):
    g = torch.Generator().manual_seed(0)
    widths = [64, 128, 256, 512, 1024, cfg.embed_dim]
    sd = {}
    r = lambda *s: torch.randn(*s, generator=g) * 0.05
    sd["bn0.weight"] = torch.ones(cfg.n_mels)
    sd["bn0.bias"] = r(cfg.n_mels)
    sd["bn0.running_mean"] = r(cfg.n_mels)
    sd["bn0.running_var"] = torch.ones(cfg.n_mels) + 0.1
    cin = 1
    for i, cout in enumerate(widths, start=1):
        p = f"conv_block{i}"
        sd[f"{p}.conv1.weight"] = r(cout, cin, 3, 3)
        sd[f"{p}.conv2.weight"] = r(cout, cout, 3, 3)
        for j in (1, 2):
            sd[f"{p}.bn{j}.weight"] = torch.ones(cout)
            sd[f"{p}.bn{j}.bias"] = r(cout)
            sd[f"{p}.bn{j}.running_mean"] = r(cout)
            sd[f"{p}.bn{j}.running_var"] = torch.ones(cout) + 0.1
        cin = cout
    sd["fc1.weight"] = r(cfg.embed_dim, cfg.embed_dim)
    sd["fc1.bias"] = r(cfg.embed_dim)
    return sd


def test_cnn14_parity_with_torch_replica():
    torch = pytest.importorskip("torch")
    cfg = pann_tiny_test()
    sd = _synthetic_state_dict(torch, cfg)
    jmodel = create_model(lambda: Cnn14(cfg, rngs=nnx.Rngs(0)))
    load_pann_from_state_dict(sd, jmodel)

    rng = np.random.default_rng(1)
    wav = rng.normal(size=(2, 16_000)).astype(np.float32) * 0.2
    mel = np.asarray(pann_logmel(jnp.asarray(wav), cfg))
    with torch.no_grad():
        t_out = _torch_cnn14(torch, sd, cfg)(torch.from_numpy(mel)).numpy()
    j_out = np.asarray(nnx.jit(lambda m, w: m(w))(jmodel, jnp.asarray(wav)))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-4)


def test_fad_self_contained():
    """fad() computes with no external registration: identical collections
    score ~0, disjoint ones score higher."""
    from v2ap_tpu.evaluation import metrics
    metrics.set_embedder(None)
    embed = make_embedder(pann_tiny_test())
    metrics.set_embedder(embed)
    try:
        rng = np.random.default_rng(0)
        ref = [rng.normal(size=16_000).astype(np.float32) * 0.1
               for _ in range(6)]
        same = metrics.fad(ref, ref, sr=16_000)
        tone = [np.sin(2 * np.pi * 440 * np.arange(16_000) / 16000
                       ).astype(np.float32) * (0.2 + 0.1 * i)
                for i in range(6)]
        diff = metrics.fad(ref, tone, sr=16_000)
        assert same < 1e-3
        assert diff > same
    finally:
        metrics.set_embedder(None)


def test_cnn14_tagging_head_parity():
    """fc_audioset logits match a torch replica (converter orientation)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    cfg = pann_tiny_test()
    sd = _synthetic_state_dict(torch, cfg)
    g = torch.Generator().manual_seed(7)
    sd["fc_audioset.weight"] = torch.randn(
        cfg.num_classes, cfg.embed_dim, generator=g) * 0.05
    sd["fc_audioset.bias"] = torch.randn(cfg.num_classes, generator=g) * 0.05
    jmodel = create_model(lambda: Cnn14(cfg, rngs=nnx.Rngs(0)))
    load_pann_from_state_dict(sd, jmodel)

    wav = np.random.default_rng(1).normal(size=(2, 16_000)).astype(np.float32) * 0.2
    mel = np.asarray(pann_logmel(jnp.asarray(wav), cfg))
    with torch.no_grad():
        emb = _torch_cnn14(torch, sd, cfg)(torch.from_numpy(mel))
        t_logits = F.linear(emb, sd["fc_audioset.weight"],
                            sd["fc_audioset.bias"]).numpy()
    j_logits = np.asarray(nnx.jit(lambda m, w: m.logits(w))(
        jmodel, jnp.asarray(wav)))
    np.testing.assert_allclose(j_logits, t_logits, rtol=2e-3, atol=2e-4)


def test_kl_and_inception_score_math():
    from v2ap_tpu.evaluation.metrics import (
        inception_score, kl_sigmoid, kl_softmax)
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(8, 10)).astype(np.float32)
    # identical collections: both KLs are exactly zero
    assert kl_softmax(logits, logits) == 0.0
    assert abs(kl_sigmoid(logits, logits)) < 1e-6
    # shifted logits: strictly positive
    assert kl_softmax(logits, logits + rng.normal(size=logits.shape)) > 0.0
    assert kl_sigmoid(logits, logits + 1.0) > 0.0
    # IS: uniform predictions -> 1; confident distinct classes -> ~n_classes
    uniform = np.zeros((10, 10), np.float32)
    m, _ = inception_score(uniform, splits=2)
    assert abs(m - 1.0) < 1e-5
    peaked = np.eye(10, dtype=np.float32) * 50.0
    m, _ = inception_score(peaked, splits=1)
    assert m > 9.0
    # pairing enforced
    with pytest.raises(ValueError):
        kl_softmax(logits[:4], logits)


def test_audioldm_eval_metrics_self_contained():
    """FAD + IS + paired KL computed with the built-in tiny Cnn14 stack."""
    from v2ap_tpu.evaluation import metrics
    from v2ap_tpu.evaluation.pann import make_classifier
    cfg = pann_tiny_test()
    embed = make_embedder(cfg)
    cls = make_classifier(cfg)
    rng = np.random.default_rng(0)
    ref = [rng.normal(size=16_000).astype(np.float32) * 0.1 for _ in range(4)]
    out = metrics.audioldm_eval_metrics(ref, ref, sr=16_000,
                                        embedder=embed, classifier=cls)
    assert out["fad"] < 1e-3
    assert out["kl_softmax"] == 0.0 and abs(out["kl_sigmoid"]) < 1e-6
    assert out["is_mean"] >= 1.0 - 1e-5 and np.isfinite(out["is_std"])
    gen = [np.sin(2 * np.pi * 330 * np.arange(16_000) / 16000
                  ).astype(np.float32) * 0.3 for _ in range(3)]
    out2 = metrics.audioldm_eval_metrics(ref, gen, sr=16_000,
                                         embedder=embed, classifier=cls)
    assert out2["fad"] > out["fad"]
    assert "kl_softmax" not in out2        # unpaired lengths -> no KL


def test_make_joint_single_pass_consistency():
    """make_joint shares one Cnn14: embeddings match make_embedder and the
    logits are exactly fc_audioset(embedding)."""
    from v2ap_tpu.evaluation.pann import make_classifier, make_joint
    cfg = pann_tiny_test()
    joint = make_joint(cfg)
    embed = make_embedder(cfg)
    cls = make_classifier(cfg)
    wav = np.random.default_rng(0).normal(size=16_000).astype(np.float32) * 0.1
    emb_j, log_j = joint(wav, 16_000)
    np.testing.assert_allclose(emb_j, embed(wav, 16_000), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(log_j, cls(wav, 16_000), rtol=1e-5, atol=1e-6)
    assert emb_j.shape == (1, cfg.embed_dim)
    assert log_j.shape == (1, cfg.num_classes)

"""Training stack: trainer step improves loss, EMA, LR schedule, DPO step,
FactorCL contrastive losses, checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.config import TrainConfig
from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.training import EMA, Trainer, make_lr_schedule
from v2ap_tpu.training.contrastive import (
    CLUBCritic, FactorCL, sample_contrastive_features,
)
from v2ap_tpu.training.dpo import (
    dpo_pair_loss, make_dpo_train_step, per_sample_flow_loss,
)
from v2ap_tpu.utils.jitting import create_model


def build_model():
    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    return cfg, model


def make_batch(cfg, b=2, n=32, nc=4, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    return {
        "latents": r(b, n, cfg.model.num_channels),
        "lens": jnp.full((b,), n, jnp.int32),
        "text_embed": r(b, n, cfg.model.dim_text),
        "context": r(b, nc, cfg.model.dim_context),
        "context_mask": jnp.ones((b, nc), bool),
    }


def test_lr_schedule_shape():
    cfg = TrainConfig(learning_rate=1e-4, warmup_steps=10, decay_steps=100)
    sched = make_lr_schedule(cfg)
    assert float(sched(0)) < float(sched(10))
    np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-5)
    assert float(sched(60)) < 1e-4


def test_trainer_loss_decreases():
    cfg, model = build_model()
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, warmup_steps=1,
                                         decay_steps=1000))
    batch = make_batch(cfg)
    losses = []
    for i in range(8):
        loss, _ = trainer.train_step(jax.random.key(42), batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_eval_step_deterministic():
    cfg, model = build_model()
    trainer = Trainer(model)
    batch = make_batch(cfg)
    l1, _ = trainer.eval_step(jax.random.key(0), batch)
    l2, _ = trainer.eval_step(jax.random.key(0), batch)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_ema_tracks_params():
    cfg, model = build_model()
    ema = EMA(model, decay=0.5)
    before = np.asarray(ema.shadow.proj_in.kernel[...]).copy()
    model.proj_in.kernel[...] = model.proj_in.kernel[...] + 1.0
    ema.update(model)
    after = np.asarray(ema.shadow.proj_in.kernel[...])
    np.testing.assert_allclose(after, before + 0.5, atol=1e-5)


def test_switch_ema_copies_shadow_into_model():
    """"switch EMA" (the reference's dead use_switch_ema flag): after a few
    updates the live params jump to the EMA shadow; optimizer state kept."""
    import jax
    cfg, model = build_model()
    trainer = Trainer(model, TrainConfig(use_ema=True, ema_decay=0.9,
                                         warmup_steps=2, decay_steps=100))
    batch = make_batch(cfg)
    for i in range(3):
        trainer.train_step(jax.random.key(i), batch)
    shadow = np.asarray(trainer.ema.shadow.proj_in.kernel[...])
    live = np.asarray(trainer.model.proj_in.kernel[...])
    assert not np.allclose(shadow, live)
    trainer.switch_ema()
    np.testing.assert_array_equal(
        np.asarray(trainer.model.proj_in.kernel[...]), shadow)
    # training continues from the switched params
    loss, _ = trainer.train_step(jax.random.key(9), batch)
    assert np.isfinite(float(loss))


def test_per_sample_flow_loss_and_dpo_pair():
    pred = jnp.zeros((2, 4, 3))
    flow = jnp.ones((2, 4, 3))
    span = jnp.asarray([[True, True, False, False], [True] * 4])
    losses = per_sample_flow_loss(pred, flow, span)
    np.testing.assert_allclose(losses, [1.0, 1.0])
    # identical pair deltas -> -logsigmoid(0) = log 2
    val = dpo_pair_loss(jnp.asarray(1.0), jnp.asarray(2.0),
                        jnp.asarray(1.0), jnp.asarray(2.0))
    np.testing.assert_allclose(float(val), np.log(2.0), rtol=1e-5)


def test_dpo_train_step_runs():
    cfg, model = build_model()
    ref = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                   with_video2roll=False, rngs=nnx.Rngs(1)))
    import optax
    opt = nnx.Optimizer(model, optax.adam(1e-4), wrt=nnx.Param)
    step = make_dpo_train_step()
    batch = make_batch(cfg, b=4)
    loss, loss_fm, loss_dpo = step(model, ref, opt, jax.random.key(0), batch)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(loss_dpo))


def test_club_critic_bounds():
    critic = create_model(lambda: CLUBCritic(8, 8, hidden=16, rngs=nnx.Rngs(0)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(6, 8)), jnp.float32)
    club = float(critic.club(x, y))
    nce = float(critic.infonce_learning_loss(x, y))
    assert np.isfinite(club) and np.isfinite(nce)


def test_factorcl_loss_and_feature_sampling():
    fcl = create_model(lambda: FactorCL(16, 24, num_labels=6, rngs=nnx.Rngs(0)))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(6, 16)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(6, 24)), jnp.float32)
    labels = jnp.arange(6)
    loss = float(fcl(a, b, labels))
    learn = float(fcl.learning_loss(a, b, labels))
    assert np.isfinite(loss) and np.isfinite(learn)

    audio = jnp.asarray(rng.normal(size=(8, 20, 16)), jnp.float32)
    text = jnp.asarray(rng.normal(size=(8, 20, 24)), jnp.float32)
    fa, fb, lab = sample_contrastive_features(audio, text, num_registers=4,
                                              rng=jax.random.key(0))
    assert fa.shape == (6, 16) and fb.shape == (6, 24)
    assert lab.tolist() == [0, 1, 2, 3, 4, 5]


def test_transformer_hidden_collection():
    from v2ap_tpu.models.transformer import TriStreamTransformer
    mc = cfglib.tiny_test().model
    model = create_model(lambda: TriStreamTransformer(mc, rngs=nnx.Rngs(0)))
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    out, (ah, th) = model(
        r(2, 16, mc.dim), times=jnp.asarray([0.1, 0.2]),
        mask=jnp.ones((2, 16), bool), text_embed=r(2, 16, mc.dim_text),
        frames_embed=r(2, 16, mc.dim_frames), context=r(2, 4, mc.dim_context),
        context_mask=jnp.ones((2, 4), bool), collect_hidden_layer=1)
    assert out.shape == (2, 16, mc.dim)
    assert ah.shape == (2, 16 + mc.num_registers, mc.dim)
    assert th.shape == (2, 16 + mc.num_registers, mc.dim_text)


def test_checkpoint_roundtrip(tmp_path):
    from v2ap_tpu.utils.checkpoint import load_model, save_model
    cfg, model = build_model()
    model.proj_in.kernel[...] = model.proj_in.kernel[...] * 0 + 7.0
    path = str(tmp_path / "ckpt")
    save_model(path, model, step=123)
    cfg2, model2 = build_model()
    model2.proj_in.kernel[...] = model2.proj_in.kernel[...] * 0
    step = load_model(path, model2)
    assert step == 123
    np.testing.assert_allclose(np.asarray(model2.proj_in.kernel[...]), 7.0)


def test_grad_accumulation_matches_manual_average():
    """The accum=2 step must equal explicitly averaging the two micro-batch
    gradients (same folded keys) and applying one optimizer update."""
    import dataclasses
    import optax
    from v2ap_tpu.training.trainer import make_train_step, make_tx

    cfg, model1 = build_model()
    _, model2 = build_model()
    # identical init — COPIED, not aliased: the train step donates model2's
    # buffers, which would invalidate model1's shared arrays
    nnx.update(model2, jax.tree.map(jnp.copy, nnx.state(model1)))

    base = TrainConfig(learning_rate=1e-3, warmup_steps=1, decay_steps=100)
    step2 = make_train_step(dataclasses.replace(base, grad_accum=2))
    opt1 = nnx.Optimizer(model1, make_tx(base), wrt=nnx.Param)
    opt2 = nnx.Optimizer(model2, make_tx(base), wrt=nnx.Param)

    batch = make_batch(cfg, b=4)
    rng = jax.random.key(0)
    l2, bk2 = step2(model2, opt2, None, None, None, rng, batch)

    # manual reference: per-micro-batch grads with the same folded keys
    def loss_fn(m, sub, mb):
        out = m.loss(mb["latents"], lens=mb["lens"],
                     text_embed=mb["text_embed"], context=mb["context"],
                     context_mask=mb["context_mask"], rng=sub)
        return out.loss, out.breakdown

    g_avg = None
    losses = []
    for i in range(2):
        mb = jax.tree.map(
            lambda x: x.reshape((2, -1) + x.shape[1:])[i]
            if hasattr(x, "ndim") and x.ndim > 0 else x, batch)
        # the train step splits each micro-batch key into (loss, contrastive)
        sub = jax.random.split(jax.random.fold_in(rng, i))[0]
        (li, _), gi = nnx.value_and_grad(loss_fn, has_aux=True)(
            model1, sub, mb)
        losses.append(li)
        g_avg = gi if g_avg is None else jax.tree.map(
            lambda a, b: a + b, g_avg, gi)
    g_avg = jax.tree.map(lambda g: g / 2.0, g_avg)
    opt1.update(model1, g_avg)

    np.testing.assert_allclose(float(l2), float(np.mean(losses)), rtol=1e-5)
    p1 = np.asarray(model1.proj_in.kernel[...])
    p2 = np.asarray(model2.proj_in.kernel[...])
    np.testing.assert_allclose(p1, p2, atol=1e-6)
    # metrics breakdown survives accumulation (mean over micro-batches)
    assert np.isfinite(float(bk2.flow)) and float(bk2.flow) > 0


def test_grad_accum_rejects_indivisible_batch():
    import dataclasses
    from v2ap_tpu.training.trainer import make_train_step, make_tx
    cfg, model = build_model()
    base = TrainConfig()
    step = make_train_step(dataclasses.replace(base, grad_accum=2))
    opt = nnx.Optimizer(model, make_tx(base), wrt=nnx.Param)
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        step(model, opt, None, None, None, jax.random.key(0),
             make_batch(cfg, b=3))


def test_trainer_dpo_contrastive_wired():
    """TrainConfig.dpo / .contrastive drive the real Trainer path end to end:
    combined loss finite and decreasing over steps (VERDICT round-1 item 3)."""
    cfg, model = build_model()
    trainer = Trainer(model, TrainConfig(
        learning_rate=1e-3, warmup_steps=1, decay_steps=1000,
        dpo=True, contrastive=True))
    assert trainer.ema is not None          # DPO implies the EMA reference
    assert trainer.fcl is not None
    batch = make_batch(cfg, b=8)            # rows [-2]/[-1] = winner/loser
    losses = []
    for i in range(6):
        loss, bk = trainer.train_step(jax.random.key(7), batch)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]


def test_contrastive_train_step_variant6():
    import optax
    from v2ap_tpu.training.contrastive import (
        FactorCL, make_contrastive_train_step)
    cfg, model = build_model()
    fcl = create_model(lambda: FactorCL(cfg.model.dim, cfg.model.dim_text,
                                        rngs=nnx.Rngs(2)))
    opt = nnx.Optimizer(model, optax.adam(1e-4), wrt=nnx.Param)
    fopt = nnx.Optimizer(fcl, optax.adam(1e-4), wrt=nnx.Param)
    step = make_contrastive_train_step(fcl)
    batch = make_batch(cfg, b=8)
    loss, loss_fm, loss_con = step(model, fcl, opt, fopt,
                                   jax.random.key(0), batch)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss_con))
    assert float(loss_con) != 0.0
    # small batches skip the contrastive term (reference gate b >= 8)
    loss2, _, loss_con2 = step(model, fcl, opt, fopt, jax.random.key(1),
                               make_batch(cfg, b=4))
    assert float(loss_con2) == 0.0


def test_mu_bf16_trains_and_halves_moment_dtype():
    """TrainConfig.mu_bf16: first moment stored bf16, loss still decreases."""
    import jax
    import jax.numpy as jnp
    from v2ap_tpu import config as cfglib
    from v2ap_tpu.config import TrainConfig
    from v2ap_tpu.models.cfm import CFM
    from v2ap_tpu.training import Trainer
    from v2ap_tpu.utils.jitting import create_model

    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    tr = Trainer(model, TrainConfig(learning_rate=1e-3, warmup_steps=1,
                                    decay_steps=100, mu_bf16=True))
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    batch = {"latents": r(2, 96, cfg.model.num_channels),
             "lens": jnp.full((2,), 96, jnp.int32),
             "text_embed": r(2, 96, cfg.model.dim_text),
             "context": r(2, 8, cfg.model.dim_context),
             "context_mask": jnp.ones((2, 8), bool)}
    losses = [float(tr.train_step(jax.random.key(i), batch)[0])
              for i in range(6)]
    assert losses[-1] < losses[0]
    mus = [x for x in jax.tree.leaves(nnx.state(tr.optimizer))
           if hasattr(x, "dtype") and x.dtype == jnp.bfloat16]
    assert mus, "no bf16 moment slabs found in optimizer state"


def test_rbg_dropout_stream_trains(monkeypatch):
    """V2AP_RBG_DROPOUT (default on; utils.jitting.model_rngs): the dropout
    stream rides the hardware RngBitGenerator; the train step must still
    learn, and =0 must restore a pure-threefry Rngs. (Param init is a
    *different* — still deterministic — draw sequence in rbg mode, since the
    dedicated dropout stream no longer advances the default stream's fold-in
    counter; converted checkpoints overwrite params either way.)"""
    from jax import dtypes as jax_dtypes
    from v2ap_tpu.utils.jitting import model_rngs

    cfg = cfglib.tiny_test()
    monkeypatch.setenv("V2AP_RBG_DROPOUT", "0")
    off = model_rngs(0).dropout()
    assert "rbg" not in str(off.dtype)
    monkeypatch.setenv("V2AP_RBG_DROPOUT", "1")
    key = model_rngs(0).dropout()
    assert jax_dtypes.issubdtype(key.dtype, jax_dtypes.prng_key)
    assert "rbg" in str(key.dtype)
    model = create_model(
        lambda: CFM(cfg.model, cfg.conditioning, with_video2roll=False,
                    rngs=model_rngs(0)))

    trainer = Trainer(model, TrainConfig(learning_rate=1e-3, warmup_steps=1,
                                         decay_steps=1000))
    batch = make_batch(cfg)
    losses = [float(trainer.train_step(jax.random.key(42), batch)[0])
              for _ in range(8)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

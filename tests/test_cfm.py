"""CFM model: sampling determinism/shape, CFG semantics, training loss."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.config import SamplerConfig
from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.utils.jitting import create_model


def build(with_v2r=False):
    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=with_v2r,
                                     rngs=nnx.Rngs(0)))
    return cfg, model


def make_cond(cfg, b=1, n=32, nc=4, seed=0):
    mc = cfg.model
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    return dict(
        text_embed=r(b, n, mc.dim_text),
        frames_embed=jnp.zeros((b, n, mc.notes), jnp.float32),
        context=r(b, nc, mc.dim_context),
        context_mask=jnp.ones((b, nc), bool),
        mask=jnp.ones((b, n), bool),
    )


sample_fn = nnx.jit(
    lambda m, x0, cond, sampler: m.sample(x0, sampler=sampler, **cond),
    static_argnames="sampler")


def test_sample_shape_and_determinism():
    cfg, model = build()
    cond = make_cond(cfg)
    x0 = jax.random.normal(jax.random.key(0), (1, 32, cfg.model.num_channels))
    sampler = SamplerConfig(steps=4, cfg_strength=2.0)
    out1 = sample_fn(model, x0, cond, sampler)
    out2 = sample_fn(model, x0, cond, sampler)
    assert out1.shape == x0.shape
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert bool(jnp.all(jnp.isfinite(out1)))


def test_cfg_strength_zero_equals_single_branch():
    cfg, model = build()
    cond = make_cond(cfg)
    x0 = jax.random.normal(jax.random.key(0), (1, 32, cfg.model.num_channels))
    out_nocfg = sample_fn(model, x0, cond, SamplerConfig(steps=4, cfg_strength=0.0))
    out_cfg = sample_fn(model, x0, cond, SamplerConfig(steps=4, cfg_strength=2.0))
    assert not np.allclose(np.asarray(out_nocfg), np.asarray(out_cfg))


def test_sample_conditioning_matters():
    cfg, model = build()
    cond = make_cond(cfg, seed=0)
    cond2 = make_cond(cfg, seed=1)
    x0 = jax.random.normal(jax.random.key(0), (1, 32, cfg.model.num_channels))
    sampler = SamplerConfig(steps=4, cfg_strength=2.0)
    out1 = sample_fn(model, x0, cond, sampler)
    out2 = sample_fn(model, x0, cond2, sampler)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


loss_fn = nnx.jit(
    lambda m, x1, lens, cond, rng, val: m.loss(
        x1, lens=lens, text_embed=cond["text_embed"], context=cond["context"],
        context_mask=cond["context_mask"], rng=rng, val=val),
    static_argnames="val")


def test_training_loss_finite_and_val_deterministic():
    cfg, model = build()
    cond = make_cond(cfg)
    rng = np.random.default_rng(3)
    x1 = jnp.asarray(rng.normal(size=(1, 32, cfg.model.num_channels)), jnp.float32)
    lens = jnp.asarray([32])
    out = loss_fn(model, x1, lens, cond, jax.random.key(0), False)
    assert np.isfinite(float(out.loss))
    # val mode with same key is deterministic
    o1 = loss_fn(model, x1, lens, cond, jax.random.key(1), True)
    o2 = loss_fn(model, x1, lens, cond, jax.random.key(1), True)
    np.testing.assert_array_equal(np.asarray(o1.loss), np.asarray(o2.loss))


def test_loss_gradients():
    cfg, model = build()
    cond = make_cond(cfg)
    x1 = jnp.asarray(np.random.default_rng(5).normal(size=(1, 32, 16)), jnp.float32)
    lens = jnp.asarray([32])

    @nnx.jit
    def grads(model):
        def inner(m):
            return m.loss(x1, lens=lens, text_embed=cond["text_embed"],
                          context=cond["context"],
                          context_mask=cond["context_mask"],
                          rng=jax.random.key(0), val=True).loss
        return nnx.grad(inner)(model)

    g = grads(model)
    leaves = [l for l in jax.tree.leaves(nnx.to_flat_state(g))
              if hasattr(l, "dtype")]
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(total) and total > 0


def test_encode_frames_piano_branch():
    cfg, model = build(with_v2r=True)
    frames = jnp.asarray(
        np.random.default_rng(0).random((1, 4, 100, 900)), jnp.float32)
    roll = nnx.jit(lambda m, f: m.encode_frames(f, 16))(model, frames)
    assert roll.shape == (1, 16, cfg.model.notes)
    assert float(roll.min()) >= 0.0 and float(roll.max()) <= 1.0
    # first 12 rows are the 4 frames x3-repeated; rest zero-padded
    np.testing.assert_allclose(np.asarray(roll[0, 12:]), 0.0, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(roll[0, 0]), np.asarray(roll[0, 2]))


def test_encode_frames_88key_fractional_rate():
    """88-key variant: video_multi 2.5 -> 4 frames become 10 roll rows."""
    import dataclasses
    cfg = cfglib.v2p_88key()
    mc = dataclasses.replace(
        cfg.model, dim=64, depth=2, heads=2, dim_head=32, dim_text=48,
        text_heads=2, text_dim_head=32, text_depth=2, dim_frames=32,
        frames_heads=2, frames_dim_head=16, max_seq_len=128, kernel_size=7,
        num_registers=4, num_channels=16, dim_context=32, dtype="float32")
    assert mc.video_multi == 2.5 and mc.notes == 88
    model = create_model(lambda: CFM(mc, cfg.conditioning,
                                     with_video2roll=True, rngs=nnx.Rngs(0)))
    frames = jnp.asarray(
        np.random.default_rng(0).random((1, 4, 100, 900)), jnp.float32)
    roll = nnx.jit(lambda m, f: m.encode_frames(f, 12))(model, frames)
    assert roll.shape == (1, 12, 88)
    # 4 frames * 2.5 = 10 valid rows, 2 zero-padded
    np.testing.assert_allclose(np.asarray(roll[0, 10:]), 0.0, atol=1e-7)
    assert float(np.abs(np.asarray(roll[0, :10])).sum()) > 0


def test_sample_multipass_refinement():
    cfg, model = build()
    cond = make_cond(cfg)
    x0 = jax.random.normal(jax.random.key(0), (1, 32, cfg.model.num_channels))
    sampler = SamplerConfig(steps=4, cfg_strength=2.0)
    base = sample_fn(model, x0, cond, sampler)
    multi = nnx.jit(
        lambda m, x0, cond, sampler: m.sample_multipass(
            x0, rng=jax.random.key(1), passes=2, restart_t=0.6,
            sampler=sampler, **cond),
        static_argnames="sampler")(model, x0, cond, sampler)
    assert multi.shape == base.shape
    assert bool(jnp.isfinite(multi).all())
    # refinement changes the sample but stays correlated with the base
    assert not np.allclose(np.asarray(multi), np.asarray(base))
    c = np.corrcoef(np.asarray(multi).ravel(), np.asarray(base).ravel())[0, 1]
    assert c > 0.3


def test_tts_token_conditioning_path():
    """TTS mode: byte tokens -> text stream -> sample (reference tokenizer +
    embed_text path, bypassed by the shipped V2A configs)."""
    from v2ap_tpu.data.tokenizers import byte_tokenizer
    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False,
                                     text_num_embeds=256, rngs=nnx.Rngs(0)))
    enc, _ = byte_tokenizer()
    tokens = jnp.asarray(enc(["hello world"]))
    text_embed = model.embed_tokens(tokens, 32)
    assert text_embed.shape == (1, 32, cfg.model.dim_text)
    cond = make_cond(cfg)
    cond["text_embed"] = text_embed
    x0 = jax.random.normal(jax.random.key(0), (1, 32, cfg.model.num_channels))
    out = sample_fn(model, x0, cond, SamplerConfig(steps=2, cfg_strength=2.0))
    assert bool(jnp.isfinite(out).all())

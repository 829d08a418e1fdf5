"""Tri-stream transformer: shapes, masking, time-conditioning, cross-condition."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.models.transformer import TriStreamTransformer, CrossCondition
from v2ap_tpu.utils.jitting import create_model


def build(cfg=None):
    mc = (cfg or cfglib.tiny_test()).model
    model = create_model(lambda: TriStreamTransformer(mc, rngs=nnx.Rngs(0)))
    return mc, model


def make_inputs(mc, b=2, n=32, nc=5, seed=0):
    rng = np.random.default_rng(seed)
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    return dict(
        x=r(b, n, mc.dim),
        times=jnp.asarray(rng.random(b), jnp.float32),
        mask=jnp.ones((b, n), bool),
        text_embed=r(b, n, mc.dim_text),
        frames_embed=r(b, n, mc.dim_frames),
        context=r(b, nc, mc.dim_context),
        context_mask=jnp.ones((b, nc), bool),
    )


fwd = nnx.jit(lambda m, kw: m(kw["x"], times=kw["times"], mask=kw["mask"],
                              text_embed=kw["text_embed"],
                              frames_embed=kw["frames_embed"],
                              context=kw["context"],
                              context_mask=kw["context_mask"]))


def test_forward_shape():
    mc, model = build()
    kw = make_inputs(mc)
    out = fwd(model, kw)
    assert out.shape == (2, 32, mc.dim)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_time_conditioning_changes_output():
    mc, model = build()
    # AdaLN layers are zero-initialised (time has no effect at init, matching
    # the DiT AdaLN-Zero design) — perturb one gamma projection to probe the
    # conditioning path.
    gamma = model.audio_blocks[0].attn_norm.to_gamma
    gamma.kernel[...] = jnp.asarray(
        np.random.default_rng(1).normal(size=gamma.kernel[...].shape) * 0.1,
        jnp.float32)
    kw = make_inputs(mc)
    out1 = fwd(model, kw)
    kw2 = dict(kw, times=kw["times"] + 0.3)
    out2 = fwd(model, kw2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_mask_isolation():
    """Padded positions must not influence valid positions."""
    mc, model = build()
    kw = make_inputs(mc, b=1, n=32)
    mask = jnp.asarray([[True] * 20 + [False] * 12])
    kw["mask"] = mask
    out1 = fwd(model, kw)
    kw2 = dict(kw)
    kw2["x"] = kw["x"].at[:, 20:].set(77.0)
    kw2["text_embed"] = kw["text_embed"].at[:, 20:].set(-33.0)
    kw2["frames_embed"] = kw["frames_embed"].at[:, 20:].set(11.0)
    out2 = fwd(model, kw2)
    np.testing.assert_allclose(np.asarray(out1[:, :20]), np.asarray(out2[:, :20]),
                               rtol=2e-3, atol=2e-4)


def test_context_affects_output():
    mc, model = build()
    kw = make_inputs(mc)
    out1 = fwd(model, kw)
    kw2 = dict(kw, context=jnp.zeros_like(kw["context"]))
    out2 = fwd(model, kw2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_cross_condition_zero_init_identity():
    cc = CrossCondition(8, 6, 4, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(1, 3, 8)), jnp.float32)
    t = jnp.asarray(rng.normal(size=(1, 3, 6)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(1, 3, 4)), jnp.float32)
    a2, t2, f2 = cc(a, t, f)
    np.testing.assert_allclose(a2, a)
    np.testing.assert_allclose(t2, t)
    np.testing.assert_allclose(f2, f)


def test_gradients_flow():
    mc, model = build()
    kw = make_inputs(mc, b=1, n=16)

    @nnx.jit
    def loss_fn(model, kw):
        def inner(m):
            out = m(kw["x"], times=kw["times"], mask=kw["mask"][:, :16],
                    text_embed=kw["text_embed"], frames_embed=kw["frames_embed"],
                    context=kw["context"], context_mask=kw["context_mask"])
            return jnp.mean(out ** 2)
        return nnx.grad(inner)(model)

    kw["mask"] = jnp.ones((1, 16), bool)
    grads = loss_fn(model, kw)
    flat = jax.tree.leaves(nnx.to_flat_state(grads))
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat if hasattr(g, "dtype"))
    assert np.isfinite(total) and total > 0


def test_fused_adaln_matches_unfused():
    """cfg.fused_adaln stacks every layer's time-cond projection into one
    matmul — outputs and input-gradients must match the per-op path. The
    projections are zero-init, so perturb them all first or the test would
    pass vacuously."""
    import dataclasses

    cfg = cfglib.tiny_test().model
    rng = np.random.default_rng(3)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    b, n = 2, 8
    args = dict(times=jnp.asarray([0.3, 0.7]), mask=None,
                text_embed=r(b, n, cfg.dim_text),
                frames_embed=r(b, n, cfg.dim_frames))
    x = r(b, n, cfg.dim)

    outs, grads = [], []
    for fused in (False, True):
        mcfg = dataclasses.replace(cfg, fused_adaln=fused)
        model = create_model(lambda: TriStreamTransformer(mcfg,
                                                          rngs=nnx.Rngs(0)))
        for blk in model.audio_blocks:
            for m in blk.cond_projections():
                k = m.to_gamma.kernel
                k[...] = jnp.asarray(np.random.default_rng(11).normal(
                    size=k[...].shape) * 0.2, jnp.float32)
        graphdef, state = nnx.split(model)

        @jax.jit
        def loss_fn(state, x):
            m = nnx.merge(graphdef, state)
            out = m(x, **args)
            return (out * out).mean()

        outs.append(float(loss_fn(state, x)))
        grads.append(np.asarray(jax.grad(loss_fn, argnums=1)(state, x)))
    assert abs(outs[0] - outs[1]) < 1e-6, outs
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-5, atol=1e-6)


def test_remat_matches_unremat():
    """cfg.remat=True must not change outputs or gradients — it only trades
    recompute for activation memory in the backward pass."""
    import dataclasses
    import jax
    from v2ap_tpu import config as cfglib

    cfg = cfglib.tiny_test().model
    rng = np.random.default_rng(0)
    r = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    b, n = 2, 8
    args = dict(times=jnp.asarray([0.3, 0.7]), mask=None,
                text_embed=r(b, n, cfg.dim_text),
                frames_embed=r(b, n, cfg.dim_frames))
    x = r(b, n, cfg.dim)

    outs, grads = [], []
    for remat in (False, True):
        mcfg = dataclasses.replace(cfg, remat=remat)
        model = create_model(lambda: TriStreamTransformer(mcfg,
                                                          rngs=nnx.Rngs(0)))
        graphdef, state = nnx.split(model)

        @jax.jit
        def loss_fn(state, x):
            m = nnx.merge(graphdef, state)
            out = m(x, **args)
            return (out * out).mean()

        outs.append(float(loss_fn(state, x)))
        g = jax.grad(loss_fn, argnums=1)(state, x)
        grads.append(np.asarray(g))
    assert abs(outs[0] - outs[1]) < 1e-6, outs
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-5, atol=1e-6)

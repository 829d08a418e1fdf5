"""Unit tests for core ops: norms, rope, attention (pallas vs XLA), conv, ff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from v2ap_tpu.ops import (
    AdaLNZero,
    AdaptiveRMSNorm,
    Attention,
    DepthwiseConv1d,
    GLUFeedForward,
    RMSNorm,
    TimeCondMLP,
    apply_rope,
    attention_reference,
    flash_attention,
    rope_table,
    sway_timesteps,
    euler_integrate,
    project_parallel,
    lens_to_mask,
    mask_from_frac_lengths,
)


def test_rmsnorm_matches_closed_form(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    norm = RMSNorm(16, rngs=nnx.Rngs(0))
    out = norm(x)
    expected = x / jnp.linalg.norm(x, axis=-1, keepdims=True) * (16 ** 0.5)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_adaptive_rmsnorm_zero_init_is_plain_rmsnorm(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    norm = AdaptiveRMSNorm(16, rngs=nnx.Rngs(0))
    out = norm(x, condition=cond)
    expected = x / jnp.linalg.norm(x, axis=-1, keepdims=True) * (16 ** 0.5)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_adaln_zero_gate_init(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    gate = AdaLNZero(16, rngs=nnx.Rngs(0))
    out = gate(x, condition=cond)
    # zero-init weights, bias -2 => gate = sigmoid(-2)
    np.testing.assert_allclose(out, x * jax.nn.sigmoid(-2.0), rtol=1e-5)


def test_rope_norm_preserving(rng):
    t = jnp.asarray(rng.normal(size=(1, 2, 10, 64)), jnp.float32)
    freqs = rope_table(10, 64)
    rot = apply_rope(t, freqs)
    np.testing.assert_allclose(
        jnp.linalg.norm(rot, axis=-1), jnp.linalg.norm(t, axis=-1), rtol=1e-4)
    # position 0 is unrotated
    np.testing.assert_allclose(rot[..., 0, :], t[..., 0, :], rtol=1e-5)


def test_rope_relative_shift_invariance(rng):
    # <q_i rot, k_j rot> depends only on i - j
    d = 32
    q = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    freqs = rope_table(16, d)
    qs = jnp.broadcast_to(q, (1, 1, 16, d))
    ks = jnp.broadcast_to(k, (1, 1, 16, d))
    qr, kr = np.asarray(apply_rope(qs, freqs)), np.asarray(apply_rope(ks, freqs))
    dots = (qr[0, 0] @ kr[0, 0].T)
    np.testing.assert_allclose(dots[2, 5], dots[7, 10], rtol=1e-4)
    np.testing.assert_allclose(dots[0, 3], dots[9, 12], rtol=1e-4)


@pytest.mark.parametrize("softclamp", [None, 50.0])
def test_flash_attention_matches_reference(rng, softclamp):
    b, h, n, d = 1, 2, 128, 64
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) > 0.3)
    ref = attention_reference(q, k, v, mask, softclamp=softclamp)
    out = flash_attention(q, k, v, mask, softclamp=softclamp,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_attention_gradients_match_reference(rng):
    """The custom VJP (XLA-reference recompute backward) produces the same
    q/k/v gradients as differentiating the reference math directly — the
    training path runs through this (Pallas kernels have no native vjp)."""
    b, h, n, d = 1, 2, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) > 0.3)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask, softclamp=50.0,
                              block_q=128, block_k=128, interpret=True)
        return (out * out).sum()

    def loss_ref(q, k, v):
        out = attention_reference(q, k, v, mask, softclamp=50.0)
        return (out * out).sum()

    import jax
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, rtol=5e-4, atol=5e-4)


def test_flash_attention_fully_masked_row_gradients(rng):
    """Regression: a batch element whose kv mask is all-False stores
    lse ~ -1e30; the backward's p = exp(s - lse) used to cancel to p = 1 for
    every key, silently inflating gradients ~70x. Masked probabilities are
    now zeroed explicitly, so the masked element contributes exactly zero
    gradient and the unmasked element matches the reference VJP."""
    b, h, n, d = 2, 2, 128, 32
    q = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, n, d)), jnp.float32)
    mask = jnp.stack([jnp.ones((n,), bool), jnp.zeros((n,), bool)])

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask, softclamp=50.0,
                              block_q=128, block_k=128, interpret=True)
        return (out * out).sum()

    dq, dk, dv = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for g in (dq, dk, dv):
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-6)

    def loss_ref(q, k, v):
        out = attention_reference(q[:1], k[:1], v[:1], mask[:1],
                                  softclamp=50.0)
        return (out * out).sum()

    rq, rk, rv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(dq[0], rq[0], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(dk[0], rk[0], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(dv[0], rv[0], rtol=5e-4, atol=5e-4)


def _unpack(t, h, d):
    b, n, _ = t.shape
    return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("softclamp", [None, 50.0])
@pytest.mark.parametrize("h,d", [(4, 64), (2, 64)])
def test_flash_packed_matches_reference(rng, softclamp, h, d):
    """The transpose-free packed kernels ((b, n, h*d) blocks, static
    head-group unroll) against the 4D reference math."""
    from v2ap_tpu.ops.flash_attention import (
        flash_attention_packed, packed_eligible)
    b, n = 2, 256
    assert packed_eligible(h, d, n, n)
    q = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) > 0.3)
    ref = attention_reference(_unpack(q, h, d), _unpack(k, h, d),
                              _unpack(v, h, d), mask, softclamp=softclamp)
    ref = np.asarray(ref.transpose(0, 2, 1, 3).reshape(b, n, h * d))
    out = flash_attention_packed(q, k, v, mask, heads=h, dim_head=d,
                                 softclamp=softclamp, block_q=128,
                                 block_k=128, interpret=True)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_packed_gradients_match_reference(rng):
    """Packed Pallas backward (dq + dkv kernels over (b, n, h*d) blocks,
    lse/dcap in the sublane-padded row layout) vs the reference VJP."""
    from v2ap_tpu.ops.flash_attention import flash_attention_packed
    b, n, h, d = 2, 256, 4, 64
    q = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, n)) > 0.3)
    w = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)

    def loss_packed(q, k, v):
        out = flash_attention_packed(q, k, v, mask, heads=h, dim_head=d,
                                     softclamp=50.0, block_q=128,
                                     block_k=128, interpret=True)
        return (out * w).sum()

    def loss_ref(q, k, v):
        out = attention_reference(_unpack(q, h, d), _unpack(k, h, d),
                                  _unpack(v, h, d), mask, softclamp=50.0)
        return (out.transpose(0, 2, 1, 3).reshape(b, n, h * d) * w).sum()

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(a, b_, rtol=5e-4, atol=5e-4)


def test_flash_packed_fully_masked_row(rng):
    """Fully-masked batch element: zero gradients, finite everywhere (same
    guarantee the 4D kernels pin)."""
    from v2ap_tpu.ops.flash_attention import flash_attention_packed
    b, n, h, d = 2, 128, 2, 64
    q = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, h * d)), jnp.float32)
    mask = jnp.stack([jnp.ones((n,), bool), jnp.zeros((n,), bool)])

    def loss(q, k, v):
        out = flash_attention_packed(q, k, v, mask, heads=h, dim_head=d,
                                     softclamp=50.0, block_q=128,
                                     block_k=128, interpret=True)
        return (out * out).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (dq, dk, dv):
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g[1]), 0.0, atol=1e-6)


def test_apply_rope_seq_axis_matches_default(rng):
    """apply_rope(seq_axis=1) on (b, n, h, d) equals the (b, h, n, d)
    default path transposed — the packed attention path depends on it."""
    b, n, h, d = 2, 12, 3, 32
    t = jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.float32)
    freqs = rope_table(n, d)
    got = apply_rope(t, freqs, seq_axis=1)
    want = apply_rope(t.transpose(0, 2, 1, 3), freqs).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # partial rotary too (frames stream: table narrower than the head)
    freqs_p = rope_table(n, 16)
    got_p = apply_rope(t, freqs_p, seq_axis=1)
    want_p = apply_rope(t.transpose(0, 2, 1, 3), freqs_p).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got_p, want_p, rtol=1e-6, atol=1e-6)


def test_attention_module_packed_matches_fallback(rng):
    """The Attention module's packed-eligible path (use_pallas=True,
    interpret-safe shapes) must match its head-transposed fallback."""
    kw = dict(dim=128, heads=2, dim_head=64, softclamp_logits=True,
              rngs=nnx.Rngs(0))
    a1 = Attention(use_pallas=False, **kw)
    x = jnp.asarray(rng.normal(size=(2, 256, 128)), jnp.float32)
    rot = rope_table(256, 64)
    mask = jnp.asarray(rng.random((2, 256)) > 0.2)
    want = a1(x, rotary=rot, mask=mask)
    # monkeypatch-free: call the packed kernel path by reusing the module
    # with use_pallas=True under interpret mode via the module's kernels
    a1.use_pallas = True
    import v2ap_tpu.ops.attention as attn_mod
    old = attn_mod.flash_attention_packed

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return old(*args, **kwargs)

    attn_mod.flash_attention_packed = interp
    try:
        got = a1(x, rotary=rot, mask=mask)
    finally:
        attn_mod.flash_attention_packed = old
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_attention_module_self_and_cross(rng):
    self_attn = Attention(32, heads=2, dim_head=16, use_pallas=False,
                          rngs=nnx.Rngs(0))
    cross_attn = Attention(32, heads=2, dim_head=16, dim_context=24,
                           use_pallas=False, rngs=nnx.Rngs(1))
    x = jnp.asarray(rng.normal(size=(2, 10, 32)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(2, 7, 24)), jnp.float32)
    rot = rope_table(10, 16)
    out_self = self_attn(x, rotary=rot, mask=jnp.ones((2, 10), bool))
    assert out_self.shape == (2, 10, 32)
    out_cross = cross_attn(x, rotary=rot, context=ctx,
                           context_mask=jnp.ones((2, 7), bool))
    assert out_cross.shape == (2, 10, 32)
    assert not jnp.allclose(out_self, out_cross)


def test_attention_mask_blocks_padding(rng):
    """Changing masked-out keys must not change the output."""
    attn = Attention(32, heads=2, dim_head=16, use_pallas=False,
                     softclamp_logits=False, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
    mask = jnp.asarray([[True] * 5 + [False] * 3])
    out1 = attn(x, mask=mask)
    x2 = x.at[:, 5:].set(99.0)
    out2 = attn(x2, mask=mask)
    np.testing.assert_allclose(out1[:, :5], out2[:, :5], rtol=1e-4, atol=1e-5)


def test_depthwise_conv_masking(rng):
    conv = DepthwiseConv1d(8, 5, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(size=(1, 12, 8)), jnp.float32)
    mask = jnp.asarray([[True] * 6 + [False] * 6])
    out = conv(x, mask=mask)
    assert out.shape == x.shape
    np.testing.assert_allclose(out[:, 6:], jnp.zeros((1, 6, 8)), atol=1e-7)
    # masked tail must not leak into the valid region
    x2 = x.at[:, 6:].set(50.0)
    out2 = conv(x2, mask=mask)
    np.testing.assert_allclose(out[:, :6], out2[:, :6], rtol=1e-5)


def test_glu_feedforward_shapes(rng):
    ff = GLUFeedForward(16, mult=2, rngs=nnx.Rngs(0))
    x = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    assert ff(x).shape == (2, 5, 16)


def test_time_cond_mlp(rng):
    mlp = TimeCondMLP(32, rngs=nnx.Rngs(0))
    t = jnp.asarray([0.0, 0.5, 1.0])
    out = mlp(t)
    assert out.shape == (3, 32)
    assert not jnp.allclose(out[0], out[1])


def test_sway_timesteps():
    ts = sway_timesteps(25, sway=True)
    assert ts.shape == (25,)
    np.testing.assert_allclose(ts[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(ts[-1], 1.0, atol=1e-6)
    assert np.all(np.diff(ts) > 0)
    # sway front-loads: first interval smaller than uniform
    assert ts[1] < 1.0 / 24.0
    np.testing.assert_allclose(ts, 1.0 - np.cos(np.pi / 2 * np.linspace(0, 1, 25)),
                               atol=1e-6)


def test_euler_integrate_linear_ode():
    # dy/dt = -y  =>  y(1) = e^-1
    ts = jnp.linspace(0.0, 1.0, 1001)
    y0 = jnp.ones((1,))
    yT = euler_integrate(lambda t, y: -y, y0, ts)
    np.testing.assert_allclose(yT, np.exp(-1.0), rtol=1e-3)


def test_project_parallel(rng):
    x = jnp.asarray(rng.normal(size=(2, 3, 4)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(2, 3, 4)), jnp.float32)
    par, orth = project_parallel(x, y)
    np.testing.assert_allclose(par + orth, x, rtol=1e-5)
    # orthogonal ⟂ y per batch row
    dots = jnp.sum(orth.reshape(2, -1) * y.reshape(2, -1), axis=-1)
    np.testing.assert_allclose(dots, jnp.zeros(2), atol=1e-4)


def test_lens_and_span_masks():
    lens = jnp.asarray([3, 5])
    m = lens_to_mask(lens, 6)
    assert m.tolist() == [[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]]
    span = mask_from_frac_lengths(lens, jnp.asarray([1.0, 0.5]), 6,
                                  jnp.asarray([0.0, 0.0]))
    assert span[0].sum() == 3 and span[1].sum() == 2


def test_midpoint_and_heun_more_accurate_than_euler():
    import jax.numpy as jnp
    ts = jnp.linspace(0.0, 1.0, 11)
    fn = lambda t, y: -y
    exact = np.exp(-1.0)
    for method, tol in (("euler", 0.06), ("midpoint", 0.002), ("heun", 0.002)):
        yT = euler_integrate(fn, jnp.ones(()), ts, method=method)
        assert abs(float(yT) - exact) < tol, method
    err_e = abs(float(euler_integrate(fn, jnp.ones(()), ts, "euler")) - exact)
    err_m = abs(float(euler_integrate(fn, jnp.ones(()), ts, "midpoint")) - exact)
    assert err_m < err_e / 5

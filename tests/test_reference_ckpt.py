"""Reference-checkpoint converter: synthetic manifest round-trips over all
four reference variants + historical name styles (the real torch model needs
x_transformers, unavailable offline — see utils/reference_ckpt.py docstring)."""

import dataclasses

import numpy as np
import pytest
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.utils.jitting import create_model
from v2ap_tpu.utils.reference_ckpt import (
    MissingKey, load_cfm_from_reference_state_dict,
)
from v2ap_tpu.utils.reference_manifest import (
    ALL_VARIANTS, audit_state_dict, reference_manifest, synthetic_state_dict,
)


def build(mc):
    cfg = cfglib.tiny_test()
    return create_model(lambda: CFM(mc, cfg.conditioning,
                                    with_video2roll=False, rngs=nnx.Rngs(0)))


def test_converter_maps_all_core_keys():
    mc = cfglib.tiny_test().model
    model = build(mc)
    sd = synthetic_state_dict(mc, "crossatt3")
    sd["text_encoder2.shared.weight"] = np.zeros((4, 4), np.float32)
    leftovers = load_cfm_from_reference_state_dict(sd, model, strict=True)
    assert leftovers == ["text_encoder2.shared.weight"]

    np.testing.assert_allclose(np.asarray(model.transformer.registers[...]),
                               sd["transformer.registers"])
    # fused qkv = concat of q/k/v transposed, with the q/k rows re-ordered
    # from the reference's interleaved rotary layout to the half-split one
    # (see utils/reference_ckpt._rope_permute)
    from v2ap_tpu.utils.reference_ckpt import _rope_permute
    rp = lambda w: _rope_permute(w, mc.heads, mc.dim_head, mc.dim_head)
    qkv = np.asarray(model.transformer.audio_blocks[0].attn.to_qkv.kernel[...])
    np.testing.assert_allclose(
        qkv, np.concatenate(
            [rp(sd["transformer.layers.0.0.3.to_q.weight"]).T,
             rp(sd["transformer.layers.0.0.3.to_k.weight"]).T,
             sd["transformer.layers.0.0.3.to_v.weight"].T],
            axis=1))
    # dwconv transpose (dim,1,k) -> (k,1,dim)
    dw = np.asarray(model.transformer.audio_blocks[0].conv.kernel[...])
    np.testing.assert_allclose(
        dw, np.transpose(sd["transformer.layers.0.0.1.dw_conv1d.0.weight"],
                         (2, 1, 0)))
    # adaln-zero bias and ff projections
    np.testing.assert_allclose(
        np.asarray(model.transformer.audio_blocks[1].ff_gate.to_gamma.bias[...]),
        sd["transformer.layers.1.0.10.to_gamma.bias"])
    np.testing.assert_allclose(
        np.asarray(model.proj_frames.kernel[...]),
        sd["proj_frames.weight"].T)


@pytest.mark.parametrize("variant", ALL_VARIANTS)
def test_converter_covers_all_reference_variants(variant):
    """crossatt / crossatt6 / crossatt3 / crossatt3_2 (SURVEY §1 matrix):
    strict conversion consumes every trainable-core key."""
    mc = cfglib.tiny_test().model
    if variant == "crossatt3_2":
        mc = dataclasses.replace(mc, notes=88, note_min=0, note_max=87)
    model = build(mc)
    sd = synthetic_state_dict(mc, variant)
    leftovers = load_cfm_from_reference_state_dict(
        dict(sd), model, strict=True)
    core = [k for k in leftovers
            if not k.startswith("transformer.contrastive_loss.")]
    assert core == []
    if variant in ("crossatt", "crossatt6"):
        # two-stream embedding: frames columns of to_audio are zeroed, so the
        # frames stream is provably inert
        cc = model.transformer.cross_conditions[0]
        w = np.asarray(cc.to_audio.kernel[...])       # (dim+dt+df, dim)
        np.testing.assert_allclose(w[mc.dim + mc.dim_text:], 0.0)
        np.testing.assert_allclose(
            w[: mc.dim + mc.dim_text],
            sd["transformer.layers.0.1.5.text_to_audio.weight"].T)
        np.testing.assert_allclose(
            np.asarray(model.proj_frames.kernel[...]), 0.0)


@pytest.mark.parametrize("flags", [
    dict(if_text_conv=False),
    dict(if_audio_conv=False),
    dict(if_cross_attn=False),
    dict(if_text_conv=False, if_audio_conv=False, if_cross_attn=False),
])
def test_converter_handles_flag_variants(flags):
    """ModuleList indices shift when conv/cross-attn modules are disabled
    (reference e2_tts_crossatt3.py:822-906); the converter must follow."""
    mc = dataclasses.replace(cfglib.tiny_test().model, **flags)
    model = build(mc)
    sd = synthetic_state_dict(mc, "crossatt3")
    leftovers = load_cfm_from_reference_state_dict(sd, model, strict=True)
    assert leftovers == []


def test_converter_legacy_name_style():
    """Historical x_transformers names: to_out.0.weight / to_v_gates."""
    mc = cfglib.tiny_test().model
    model = build(mc)
    sd = synthetic_state_dict(mc, "crossatt3", name_style="legacy")
    leftovers = load_cfm_from_reference_state_dict(sd, model, strict=True)
    assert leftovers == []


def test_audit_report():
    mc = cfglib.tiny_test().model
    model = build(mc)
    sd = synthetic_state_dict(mc, "crossatt3")
    sd["text_encoder2.shared.weight"] = np.zeros((4, 4), np.float32)
    sd["mystery.weight"] = np.zeros((2,), np.float32)
    report = audit_state_dict(sd, model)
    assert report["consumed"] == report["total"] - 2
    assert report["frozen_copies_skipped"] == 1
    assert report["unexpected_unconsumed"] == ["mystery.weight"]


def test_converter_strict_flags_unknown_core_keys():
    mc = cfglib.tiny_test().model
    model = build(mc)
    sd = synthetic_state_dict(mc, "crossatt3")
    sd["transformer.layers.0.0.3.unknown_extra"] = np.zeros(3, np.float32)
    with pytest.raises(MissingKey):
        load_cfm_from_reference_state_dict(sd, model, strict=True)


def test_converter_missing_key_raises():
    mc = cfglib.tiny_test().model
    model = build(mc)
    sd = synthetic_state_dict(mc, "crossatt3")
    del sd["transformer.registers"]
    with pytest.raises(MissingKey):
        load_cfm_from_reference_state_dict(sd, model)


def test_manifest_shapes_against_model():
    """Every manifest tensor matches the converter's expectations by
    construction; sanity-check a few absolute shapes."""
    mc = cfglib.tiny_test().model
    man = reference_manifest(mc, "crossatt3")
    assert man["transformer.layers.0.0.3.to_q.weight"] == (
        mc.heads * mc.dim_head, mc.dim)
    assert man["transformer.layers.0.1.5.text_frames_to_audio.weight"] == (
        mc.dim, mc.dim + mc.dim_text + mc.dim_frames)
    man2 = reference_manifest(mc, "crossatt")
    assert "transformer.layers.0.2.0.dw_conv1d.0.weight" not in man2
    assert man2["transformer.layers.0.1.5.text_to_audio.weight"] == (
        mc.dim, mc.dim + mc.dim_text)

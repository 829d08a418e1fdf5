"""Reference-checkpoint converter: synthetic manifest round-trip (the real
torch model needs x_transformers, unavailable offline — see
utils/reference_ckpt.py docstring)."""

import numpy as np
import pytest
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.utils.jitting import create_model
from v2ap_tpu.utils.reference_ckpt import (
    MissingKey, load_cfm_from_reference_state_dict,
)


def synthetic_reference_sd(mc, rng):
    """Build a reference-layout state dict with the tiny config's shapes."""
    sd = {}
    r = lambda *s: rng.normal(size=s).astype(np.float32)

    def attn(prefix, dim, heads, dim_head, dim_ctx=None):
        inner = heads * dim_head
        dim_ctx = dim_ctx or dim
        sd[f"{prefix}.to_q.weight"] = r(inner, dim)
        sd[f"{prefix}.to_k.weight"] = r(inner, dim_ctx)
        sd[f"{prefix}.to_v.weight"] = r(inner, dim_ctx)
        sd[f"{prefix}.to_out.weight"] = r(dim, inner)
        sd[f"{prefix}.to_v_head_gate.weight"] = r(heads, dim)
        sd[f"{prefix}.to_v_head_gate.bias"] = r(heads)

    def ff(prefix, dim, mult):
        inner = dim * mult
        sd[f"{prefix}.ff.0.proj.weight"] = r(inner * 2, dim)
        sd[f"{prefix}.ff.0.proj.bias"] = r(inner * 2)
        sd[f"{prefix}.ff.2.weight"] = r(dim, inner)
        sd[f"{prefix}.ff.2.bias"] = r(dim)

    def dwconv(prefix, dim, k):
        sd[f"{prefix}.dw_conv1d.0.weight"] = r(dim, 1, k)
        sd[f"{prefix}.dw_conv1d.0.bias"] = r(dim)

    sd["transformer.abs_pos_emb.weight"] = r(mc.max_seq_len, mc.dim)
    sd["transformer.registers"] = r(mc.num_registers, mc.dim)
    sd["transformer.text_registers"] = r(mc.num_registers, mc.dim_text)
    sd["transformer.frames_registers"] = r(mc.num_registers, mc.dim_frames)
    sd["transformer.time_cond_mlp.0.weights"] = r(mc.dim // 2)
    sd["transformer.time_cond_mlp.1.weight"] = r(mc.dim, mc.dim + 1)
    sd["transformer.time_cond_mlp.1.bias"] = r(mc.dim)
    half = mc.depth // 2
    for i in range(mc.depth):
        sp = f"transformer.layers.{i}.0"
        if i >= half:
            sd[f"{sp}.0.weight"] = r(mc.dim, mc.dim * 2)
        dwconv(f"{sp}.1", mc.dim, mc.kernel_size)
        sd[f"{sp}.2.to_gamma.weight"] = r(mc.dim, mc.dim)
        attn(f"{sp}.3", mc.dim, mc.heads, mc.dim_head)
        sd[f"{sp}.4.to_gamma.weight"] = r(mc.dim, mc.dim)
        sd[f"{sp}.4.to_gamma.bias"] = r(mc.dim)
        sd[f"{sp}.5.to_gamma.weight"] = r(mc.dim, mc.dim)
        attn(f"{sp}.6", mc.dim, mc.heads, mc.dim_head, dim_ctx=mc.dim_context)
        sd[f"{sp}.7.to_gamma.weight"] = r(mc.dim, mc.dim)
        sd[f"{sp}.7.to_gamma.bias"] = r(mc.dim)
        sd[f"{sp}.8.to_gamma.weight"] = r(mc.dim, mc.dim)
        ff(f"{sp}.9", mc.dim, mc.ff_mult)
        sd[f"{sp}.10.to_gamma.weight"] = r(mc.dim, mc.dim)
        sd[f"{sp}.10.to_gamma.bias"] = r(mc.dim)

        tp = f"transformer.layers.{i}.1"
        dwconv(f"{tp}.0", mc.dim_text, mc.kernel_size)
        sd[f"{tp}.1.g"] = r(mc.dim_text)
        attn(f"{tp}.2", mc.dim_text, mc.text_heads, mc.text_dim_head)
        sd[f"{tp}.3.g"] = r(mc.dim_text)
        ff(f"{tp}.4", mc.dim_text, mc.text_ff_mult)
        sd[f"{tp}.5.text_frames_to_audio.weight"] = r(
            mc.dim, mc.dim + mc.dim_text + mc.dim_frames)
        if i < mc.text_depth - 1:
            sd[f"{tp}.5.audio_to_text.weight"] = r(mc.dim_text,
                                                   mc.dim + mc.dim_text)
            sd[f"{tp}.5.audio_to_frames.weight"] = r(mc.dim_frames,
                                                     mc.dim + mc.dim_frames)

        fp = f"transformer.layers.{i}.2"
        dwconv(f"{fp}.0", mc.dim_frames, mc.kernel_size)
        sd[f"{fp}.1.g"] = r(mc.dim_frames)
        attn(f"{fp}.2", mc.dim_frames, mc.frames_heads, mc.frames_dim_head)
        sd[f"{fp}.3.g"] = r(mc.dim_frames)
        ff(f"{fp}.4", mc.dim_frames, mc.frames_ff_mult)

    sd["transformer.final_norm.g"] = r(mc.dim)
    sd["proj_in.weight"] = r(mc.dim, mc.num_channels)
    sd["proj_in.bias"] = r(mc.dim)
    sd["cond_proj_in.weight"] = r(mc.dim, mc.num_channels)
    sd["cond_proj_in.bias"] = r(mc.dim)
    sd["to_pred.weight"] = r(mc.num_channels, mc.dim)
    sd["to_pred.bias"] = r(mc.num_channels)
    sd["proj_frames.weight"] = r(mc.dim_frames, mc.notes)
    sd["proj_frames.bias"] = r(mc.dim_frames)
    sd["text_encoder2.shared.weight"] = r(4, 4)     # frozen copy, ignored
    return sd


def test_converter_maps_all_core_keys():
    cfg = cfglib.tiny_test()
    mc = cfg.model
    model = create_model(lambda: CFM(mc, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    rng = np.random.default_rng(0)
    sd = synthetic_reference_sd(mc, rng)
    leftovers = load_cfm_from_reference_state_dict(sd, model, strict=True)
    assert leftovers == ["text_encoder2.shared.weight"]

    np.testing.assert_allclose(np.asarray(model.transformer.registers[...]),
                               sd["transformer.registers"])
    # fused qkv = concat of q/k/v transposed
    qkv = np.asarray(model.transformer.audio_blocks[0].attn.to_qkv.kernel[...])
    np.testing.assert_allclose(
        qkv, np.concatenate([sd["transformer.layers.0.0.3.to_q.weight"].T,
                             sd["transformer.layers.0.0.3.to_k.weight"].T,
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


def test_converter_strict_flags_unknown_core_keys():
    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    sd = synthetic_reference_sd(cfg.model, np.random.default_rng(0))
    sd["transformer.layers.0.0.3.unknown_extra"] = np.zeros(3, np.float32)
    with pytest.raises(MissingKey):
        load_cfm_from_reference_state_dict(sd, model, strict=True)


def test_converter_missing_key_raises():
    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    sd = synthetic_reference_sd(cfg.model, np.random.default_rng(0))
    del sd["transformer.registers"]
    with pytest.raises(MissingKey):
        load_cfm_from_reference_state_dict(sd, model)

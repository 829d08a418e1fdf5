"""Torch -> JAX weight converters for the frozen encoder stack and the
published reference checkpoints.

The framework's own training state is orbax-native; these converters exist so
a user of the reference can bring the published HF checkpoints
(``facebook/encodec_24khz``, ``flan-t5-large``, CLIP ViT-bigG, and the
``lshzhm/Video-to-Audio-and-Piano`` CFM checkpoint — reference app.py:36)
into this framework once, offline.

torch is only imported inside functions (CPU wheels suffice; nothing here
runs in the hot path).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _t2j(t) -> jnp.ndarray:
    return jnp.asarray(np.asarray(t.detach().cpu().numpy()))


# --------------------------------------------------------------------- encodec

def load_encodec_from_torch(torch_model, jax_model) -> None:
    """Copy weights from an HF ``EncodecModel`` (torch) into
    ``v2ap_tpu.models.encodec.EncodecModel`` in place.

    Weight-norm parametrizations are folded by reading ``.weight`` through
    torch's parametrization machinery.
    """
    for tl, jl in ((torch_model.encoder.layers, jax_model.encoder.layers),
                   (torch_model.decoder.layers, jax_model.decoder.layers)):
        assert len(tl) == len(jl), (len(tl), len(jl))
        for tmod, jmod in zip(tl, jl):
            if type(jmod).__name__ == "Elu":      # activation placeholder
                continue
            _copy_codec_layer(tmod, jmod)
    # quantizer codebooks
    try:
        layers = list(torch_model.quantizer.layers)
    except AttributeError:
        layers = []
    if layers:
        cbs = np.stack([np.asarray(l.codebook.embed.detach().cpu().numpy())
                        for l in layers])
        q = jax_model.quantizer.codebooks[...].shape[0]
        jax_model.quantizer.codebooks[...] = jnp.asarray(cbs[:q])


def _copy_codec_layer(tmod, jmod) -> None:
    from v2ap_tpu.models.encodec import (
        CausalConv1d, CausalConvTranspose1d, ResnetBlock1d, ResidualLSTM)

    name = type(tmod).__name__
    if isinstance(jmod, CausalConv1d):
        w = _t2j(tmod.conv.weight)          # (out, in, k)
        jmod.kernel[...] = jnp.transpose(w, (2, 1, 0))
        jmod.bias[...] = _t2j(tmod.conv.bias)
    elif isinstance(jmod, CausalConvTranspose1d):
        w = _t2j(tmod.conv.weight)          # (in, out, k)
        jmod.kernel[...] = jnp.transpose(w, (2, 1, 0))   # (k, out, in)
        jmod.bias[...] = _t2j(tmod.conv.bias)
    elif isinstance(jmod, ResidualLSTM):
        lstm = tmod.lstm
        for layer in range(jmod.num_layers):
            jmod.w_ih[layer][...] = _t2j(getattr(lstm, f"weight_ih_l{layer}"))
            jmod.w_hh[layer][...] = _t2j(getattr(lstm, f"weight_hh_l{layer}"))
            jmod.b_ih[layer][...] = _t2j(getattr(lstm, f"bias_ih_l{layer}"))
            jmod.b_hh[layer][...] = _t2j(getattr(lstm, f"bias_hh_l{layer}"))
    elif isinstance(jmod, ResnetBlock1d):
        tconvs = [m for m in tmod.block if type(m).__name__ == "EncodecConv1d"]
        assert len(tconvs) == len(jmod.block)
        for tc, jc in zip(tconvs, jmod.block):
            _copy_codec_layer(tc, jc)
        _copy_codec_layer(tmod.shortcut, jmod.shortcut)
    else:  # pragma: no cover
        raise ValueError(f"unhandled codec layer {name} -> {type(jmod).__name__}")


# ------------------------------------------------------------------------ t5

def load_t5_from_torch(torch_model, jax_model) -> None:
    """HF ``T5EncoderModel`` -> ``v2ap_tpu.models.t5.T5Encoder``."""
    sd = {k: _t2j(v) for k, v in torch_model.state_dict().items()}
    jax_model.embed.embedding[...] = sd["shared.weight"]
    for i, blk in enumerate(jax_model.blocks):
        p = f"encoder.block.{i}.layer"
        blk.attn.q.kernel[...] = sd[f"{p}.0.SelfAttention.q.weight"].T
        blk.attn.k.kernel[...] = sd[f"{p}.0.SelfAttention.k.weight"].T
        blk.attn.v.kernel[...] = sd[f"{p}.0.SelfAttention.v.weight"].T
        blk.attn.o.kernel[...] = sd[f"{p}.0.SelfAttention.o.weight"].T
        blk.ln1.weight[...] = sd[f"{p}.0.layer_norm.weight"]
        if blk.attn.rel_bias is not None:
            blk.attn.rel_bias.embedding[...] = sd[
                f"{p}.0.SelfAttention.relative_attention_bias.weight"]
        ff = blk.ff
        if ff.gated:
            ff.wi_0.kernel[...] = sd[f"{p}.1.DenseReluDense.wi_0.weight"].T
            ff.wi_1.kernel[...] = sd[f"{p}.1.DenseReluDense.wi_1.weight"].T
        else:
            ff.wi.kernel[...] = sd[f"{p}.1.DenseReluDense.wi.weight"].T
        ff.wo.kernel[...] = sd[f"{p}.1.DenseReluDense.wo.weight"].T
        blk.ln2.weight[...] = sd[f"{p}.1.layer_norm.weight"]
    jax_model.final_ln.weight[...] = sd["encoder.final_layer_norm.weight"]


# ---------------------------------------------------------------------- clip

def load_clip_vision_from_torch(torch_model, jax_model) -> None:
    """HF ``CLIPVisionModelWithProjection`` ->
    ``v2ap_tpu.models.clip_vit.CLIPVisionModel``."""
    sd = {k: _t2j(v) for k, v in torch_model.state_dict().items()}
    v = "vision_model"
    # patch conv: torch (out, in, kh, kw) -> flax (kh, kw, in, out)
    w = sd[f"{v}.embeddings.patch_embedding.weight"]
    jax_model.patch_embed.kernel[...] = jnp.transpose(w, (2, 3, 1, 0))
    jax_model.class_embedding[...] = sd[f"{v}.embeddings.class_embedding"]
    jax_model.position_embedding[...] = sd[f"{v}.embeddings.position_embedding.weight"]
    # HF's pre-layernorm attr is historically misspelled "pre_layrnorm"
    pre = (f"{v}.pre_layrnorm" if f"{v}.pre_layrnorm.weight" in sd
           else f"{v}.pre_layernorm")
    jax_model.pre_layernorm.scale[...] = sd[f"{pre}.weight"]
    jax_model.pre_layernorm.bias[...] = sd[f"{pre}.bias"]
    for i, blk in enumerate(jax_model.blocks):
        p = f"{v}.encoder.layers.{i}"
        for src, dst in (("q_proj", blk.attn.q), ("k_proj", blk.attn.k),
                         ("v_proj", blk.attn.v), ("out_proj", blk.attn.o)):
            dst.kernel[...] = sd[f"{p}.self_attn.{src}.weight"].T
            dst.bias[...] = sd[f"{p}.self_attn.{src}.bias"]
        blk.ln1.scale[...] = sd[f"{p}.layer_norm1.weight"]
        blk.ln1.bias[...] = sd[f"{p}.layer_norm1.bias"]
        blk.ln2.scale[...] = sd[f"{p}.layer_norm2.weight"]
        blk.ln2.bias[...] = sd[f"{p}.layer_norm2.bias"]
        blk.mlp.fc1.kernel[...] = sd[f"{p}.mlp.fc1.weight"].T
        blk.mlp.fc1.bias[...] = sd[f"{p}.mlp.fc1.bias"]
        blk.mlp.fc2.kernel[...] = sd[f"{p}.mlp.fc2.weight"].T
        blk.mlp.fc2.bias[...] = sd[f"{p}.mlp.fc2.bias"]
    jax_model.post_layernorm.scale[...] = sd[f"{v}.post_layernorm.weight"]
    jax_model.post_layernorm.bias[...] = sd[f"{v}.post_layernorm.bias"]
    jax_model.visual_projection.kernel[...] = sd["visual_projection.weight"].T


# -------------------------------------------------------------------- dinov2

def load_dinov2_from_torch(torch_model, jax_model) -> None:
    """HF ``Dinov2Model`` -> ``v2ap_tpu.models.dinov2.Dinov2Model`` (the
    reference's dinov2-giant tower, e2_tts_crossatt3.py:1431-1433)."""
    sd = {k: _t2j(v) for k, v in torch_model.state_dict().items()}
    e = "embeddings"
    w = sd[f"{e}.patch_embeddings.projection.weight"]   # (out, in, kh, kw)
    jax_model.patch_embed.kernel[...] = jnp.transpose(w, (2, 3, 1, 0))
    jax_model.patch_embed.bias[...] = sd[f"{e}.patch_embeddings.projection.bias"]
    jax_model.cls_token[...] = sd[f"{e}.cls_token"][0, 0]
    pos = np.asarray(sd[f"{e}.position_embeddings"][0])   # (1+N_src, d)
    n_dst = jax_model.position_embedding[...].shape[0] - 1
    n_src = pos.shape[0] - 1
    if n_src != n_dst:
        # checkpoint trained at another resolution (giant ships 518px=37x37;
        # serving crops 224px=16x16): bicubic-resize the patch-grid table,
        # matching HF's interpolate_pos_encoding
        import jax
        g_src = int(round(n_src ** 0.5))
        g_dst = int(round(n_dst ** 0.5))
        grid = pos[1:].reshape(g_src, g_src, -1)
        grid = np.asarray(jax.image.resize(
            jnp.asarray(grid), (g_dst, g_dst, grid.shape[-1]), "bicubic"))
        pos = np.concatenate([pos[:1], grid.reshape(g_dst * g_dst, -1)])
    jax_model.position_embedding[...] = jnp.asarray(pos)
    for i, blk in enumerate(jax_model.blocks):
        p = f"encoder.layer.{i}"
        for src, dst in (("query", blk.attn.q), ("key", blk.attn.k),
                         ("value", blk.attn.v)):
            dst.kernel[...] = sd[f"{p}.attention.attention.{src}.weight"].T
            dst.bias[...] = sd[f"{p}.attention.attention.{src}.bias"]
        blk.attn.o.kernel[...] = sd[f"{p}.attention.output.dense.weight"].T
        blk.attn.o.bias[...] = sd[f"{p}.attention.output.dense.bias"]
        blk.norm1.scale[...] = sd[f"{p}.norm1.weight"]
        blk.norm1.bias[...] = sd[f"{p}.norm1.bias"]
        blk.norm2.scale[...] = sd[f"{p}.norm2.weight"]
        blk.norm2.bias[...] = sd[f"{p}.norm2.bias"]
        blk.scale1[...] = sd[f"{p}.layer_scale1.lambda1"]
        blk.scale2[...] = sd[f"{p}.layer_scale2.lambda1"]
        if f"{p}.mlp.weights_in.weight" in sd:           # SwiGLU (giant)
            blk.mlp.weights_in.kernel[...] = sd[f"{p}.mlp.weights_in.weight"].T
            blk.mlp.weights_in.bias[...] = sd[f"{p}.mlp.weights_in.bias"]
            blk.mlp.weights_out.kernel[...] = sd[f"{p}.mlp.weights_out.weight"].T
            blk.mlp.weights_out.bias[...] = sd[f"{p}.mlp.weights_out.bias"]
        else:                                            # plain MLP
            blk.mlp.fc1.kernel[...] = sd[f"{p}.mlp.fc1.weight"].T
            blk.mlp.fc1.bias[...] = sd[f"{p}.mlp.fc1.bias"]
            blk.mlp.fc2.kernel[...] = sd[f"{p}.mlp.fc2.weight"].T
            blk.mlp.fc2.bias[...] = sd[f"{p}.mlp.fc2.bias"]
    jax_model.layernorm.scale[...] = sd["layernorm.weight"]
    jax_model.layernorm.bias[...] = sd["layernorm.bias"]


# ------------------------------------------------------------------ convnext

def load_convnext_from_torch(torch_model, jax_model,
                             head_state: dict | None = None) -> None:
    """HF ``ConvNextModel`` -> the trunk of
    ``v2ap_tpu.models.convnext.ConvNextCLIP``.

    ``head_state`` optionally carries the open_clip projection head tensors
    (keys ``mlp.fc1.weight/bias``, ``mlp.fc2.weight/bias`` as in
    ``visual.head.*`` of the open_clip checkpoint)."""
    sd = {k: _t2j(v) for k, v in torch_model.state_dict().items()}
    pre = "convnext." if any(k.startswith("convnext.") for k in sd) else ""

    def conv(jmod, key):
        jmod.kernel[...] = jnp.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))
        jmod.bias[...] = sd[f"{key}.bias"]

    def ln(jmod, key):
        jmod.scale[...] = sd[f"{key}.weight"]
        jmod.bias[...] = sd[f"{key}.bias"]

    conv(jax_model.stem_conv, f"{pre}embeddings.patch_embeddings")
    ln(jax_model.stem_norm, f"{pre}embeddings.layernorm")
    for s in range(4):
        if s > 0:
            d = f"{pre}encoder.stages.{s}.downsampling_layer"
            ln(jax_model.downsamples[s - 1].norm, f"{d}.0")
            conv(jax_model.downsamples[s - 1].conv, f"{d}.1")
        for i, blk in enumerate(jax_model.stages[s]):
            p = f"{pre}encoder.stages.{s}.layers.{i}"
            # depthwise conv: torch (dim, 1, 7, 7) -> flax (7, 7, 1, dim)
            w = sd[f"{p}.dwconv.weight"]
            blk.dwconv.kernel[...] = jnp.transpose(w, (2, 3, 1, 0))
            blk.dwconv.bias[...] = sd[f"{p}.dwconv.bias"]
            ln(blk.norm, f"{p}.layernorm")
            blk.pwconv1.kernel[...] = sd[f"{p}.pwconv1.weight"].T
            blk.pwconv1.bias[...] = sd[f"{p}.pwconv1.bias"]
            blk.pwconv2.kernel[...] = sd[f"{p}.pwconv2.weight"].T
            blk.pwconv2.bias[...] = sd[f"{p}.pwconv2.bias"]
            blk.scale[...] = sd[f"{p}.layer_scale_parameter"]
    ln(jax_model.head_norm, f"{pre}layernorm")
    if head_state:
        h = {k: _t2j(v) for k, v in head_state.items()}
        jax_model.head_fc1.kernel[...] = h["mlp.fc1.weight"].T
        jax_model.head_fc1.bias[...] = h["mlp.fc1.bias"]
        jax_model.head_fc2.kernel[...] = h["mlp.fc2.weight"].T
        jax_model.head_fc2.bias[...] = h["mlp.fc2.bias"]


# ---------------------------------------------------------------------- clap

def load_clap_from_torch(torch_model, jax_model) -> None:
    """HF ``ClapModel`` (e.g. laion/clap-htsat-unfused) ->
    ``v2ap_tpu.models.clap.ClapModel``. Replaces the reference's vendored
    CLAP tower (src/audioldm/clap/, consumed by torch_tools.py:163-203)."""
    sd = {k: _t2j(v) for k, v in torch_model.state_dict().items()}

    def lin(jmod, key):
        jmod.kernel[...] = sd[f"{key}.weight"].T
        if f"{key}.bias" in sd and jmod.bias is not None:
            jmod.bias[...] = sd[f"{key}.bias"]

    def ln(jmod, key):
        jmod.scale[...] = sd[f"{key}.weight"]
        jmod.bias[...] = sd[f"{key}.bias"]

    # ---- audio tower
    a = "audio_model.audio_encoder"
    jau = jax_model.audio_model
    jau.batch_norm.scale[...] = sd[f"{a}.batch_norm.weight"]
    jau.batch_norm.bias[...] = sd[f"{a}.batch_norm.bias"]
    jau.batch_norm.mean[...] = sd[f"{a}.batch_norm.running_mean"]
    jau.batch_norm.var[...] = sd[f"{a}.batch_norm.running_var"]
    w = sd[f"{a}.patch_embed.proj.weight"]          # (out, in, kh, kw)
    jau.patch_embed.kernel[...] = jnp.transpose(w, (2, 3, 1, 0))
    jau.patch_embed.bias[...] = sd[f"{a}.patch_embed.proj.bias"]
    ln(jau.patch_norm, f"{a}.patch_embed.norm")
    for s, blocks in enumerate(jau.stages):
        for i, blk in enumerate(blocks):
            p = f"{a}.layers.{s}.blocks.{i}"
            ln(blk.ln1, f"{p}.layernorm_before")
            ln(blk.ln2, f"{p}.layernorm_after")
            for src, dst in (("query", blk.attn.q), ("key", blk.attn.k),
                             ("value", blk.attn.v)):
                lin(dst, f"{p}.attention.self.{src}")
            blk.attn.bias_table[...] = sd[
                f"{p}.attention.self.relative_position_bias_table"]
            lin(blk.attn.o, f"{p}.attention.output.dense")
            lin(blk.fc1, f"{p}.intermediate.dense")
            lin(blk.fc2, f"{p}.output.dense")
        if s < len(jau.stages) - 1:
            d = f"{a}.layers.{s}.downsample"
            ln(jau.mergers[s].norm, f"{d}.norm")
            lin(jau.mergers[s].reduction, f"{d}.reduction")
    ln(jau.norm, f"{a}.norm")

    # ---- text tower
    t = "text_model"
    jt = jax_model.text_model
    jt.word_emb.embedding[...] = sd[f"{t}.embeddings.word_embeddings.weight"]
    jt.pos_emb.embedding[...] = sd[
        f"{t}.embeddings.position_embeddings.weight"]
    jt.type_emb.embedding[...] = sd[
        f"{t}.embeddings.token_type_embeddings.weight"]
    ln(jt.emb_ln, f"{t}.embeddings.LayerNorm")
    for i, layer in enumerate(jt.layers):
        p = f"{t}.encoder.layer.{i}"
        for src, dst in (("query", layer.q), ("key", layer.k),
                         ("value", layer.v)):
            lin(dst, f"{p}.attention.self.{src}")
        lin(layer.attn_out, f"{p}.attention.output.dense")
        ln(layer.attn_ln, f"{p}.attention.output.LayerNorm")
        lin(layer.inter, f"{p}.intermediate.dense")
        lin(layer.out, f"{p}.output.dense")
        ln(layer.out_ln, f"{p}.output.LayerNorm")
    lin(jt.pooler, f"{t}.pooler.dense")

    # ---- projections
    for name in ("audio_projection", "text_projection"):
        jproj = getattr(jax_model, name)
        lin(jproj.linear1, f"{name}.linear1")
        lin(jproj.linear2, f"{name}.linear2")


# ----------------------------------------------------------------- video2roll

def load_video2roll_from_torch(torch_model, jax_model) -> None:
    """Torch Audeo ``Video2RollNet.resnet18`` -> models/video2roll.py (the
    trained piano-perception net inside the published CFM checkpoints,
    reference e2_tts_crossatt3.py:1523)."""
    sd = {k: _t2j(v) for k, v in torch_model.state_dict().items()}

    def conv(jmod, key):
        jmod.kernel[...] = jnp.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))
        if f"{key}.bias" in sd:
            jmod.bias[...] = sd[f"{key}.bias"]

    def bn(jmod, key):
        jmod.scale[...] = sd[f"{key}.weight"]
        jmod.bias[...] = sd[f"{key}.bias"]
        jmod.mean[...] = sd[f"{key}.running_mean"]
        jmod.var[...] = sd[f"{key}.running_var"]

    def convbn(jmod, conv_key, bn_key):
        conv(jmod.conv, conv_key)
        bn(jmod.bn, bn_key)

    def linear(jmod, key):
        jmod.kernel[...] = sd[f"{key}.weight"].T
        jmod.bias[...] = sd[f"{key}.bias"]

    convbn(jax_model.stem, "conv1", "bn1")
    for li, layer in enumerate((jax_model.layer1, jax_model.layer2,
                                jax_model.layer3, jax_model.layer4), start=1):
        for bi, blk in enumerate(layer):
            p = f"layer{li}.{bi}"
            convbn(blk.cb1, f"{p}.conv1", f"{p}.bn1")
            convbn(blk.cb2, f"{p}.conv2", f"{p}.bn2")
            if blk.down is not None:
                convbn(blk.down, f"{p}.downsample.0", f"{p}.downsample.1")

    for jftb, key in ((jax_model.ftb2_1, "FTB2_1"), (jax_model.ftb2_2, "FTB2_2"),
                      (jax_model.ftb3, "FTB3"), (jax_model.ftb4, "FTB4")):
        conv(jftb.conv0, f"{key}.conv0")
        convbn(jftb.cb1, f"{key}.conv1", f"{key}.bn1")
        conv(jftb.conv2, f"{key}.conv2")

    for jfrb, key in ((jax_model.frb2, "FRB2"), (jax_model.frb3, "FRB3"),
                      (jax_model.frb4, "FRB4")):
        linear(jfrb.fc1, f"{key}.fc1")
        linear(jfrb.fc2, f"{key}.fc2")

    convbn(jax_model.toplayer, "toplayer", "toplayer_bn")
    conv(jax_model.conv2, "conv2")
    linear(jax_model.fc, "fc")


# --------------------------------------------------------------------- vocos

def load_vocos_from_state_dict(state_dict, jax_model) -> None:
    """charactr/vocos-mel-24khz state dict -> ``v2ap_tpu.models.vocos.Vocos``.

    Takes a raw name->tensor mapping (the vocos package need not be
    installed; ``torch.load(..., map_location='cpu')['state_dict']`` or the
    HF safetensors dict both work). Reference wiring: e2_tts_crossatt3.py:
    47-49,1404-1405.
    """
    sd = {}
    for k, v in state_dict.items():
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = jnp.asarray(v)

    def conv1d(jmod, key):               # torch (out, in|1, k) -> flax (k, in, out)
        jmod.kernel[...] = jnp.transpose(sd[f"{key}.weight"], (2, 1, 0))
        jmod.bias[...] = sd[f"{key}.bias"]

    def ln(jmod, key):
        jmod.scale[...] = sd[f"{key}.weight"]
        jmod.bias[...] = sd[f"{key}.bias"]

    conv1d(jax_model.embed, "backbone.embed")
    ln(jax_model.norm, "backbone.norm")
    for i, blk in enumerate(jax_model.blocks):
        p = f"backbone.convnext.{i}"
        w = sd[f"{p}.dwconv.weight"]                     # (dim, 1, k)
        blk.dwconv.kernel[...] = jnp.transpose(w, (2, 1, 0))
        blk.dwconv.bias[...] = sd[f"{p}.dwconv.bias"]
        ln(blk.norm, f"{p}.norm")
        blk.pwconv1.kernel[...] = sd[f"{p}.pwconv1.weight"].T
        blk.pwconv1.bias[...] = sd[f"{p}.pwconv1.bias"]
        blk.pwconv2.kernel[...] = sd[f"{p}.pwconv2.weight"].T
        blk.pwconv2.bias[...] = sd[f"{p}.pwconv2.bias"]
        blk.gamma[...] = sd[f"{p}.gamma"]
    ln(jax_model.final_norm, "backbone.final_layer_norm")
    jax_model.head.kernel[...] = sd["head.out.weight"].T
    jax_model.head.bias[...] = sd["head.out.bias"]


# ------------------------------------------------------------------ ldm unet

def load_ldm_unet_from_torch(torch_unet, jax_unet) -> None:
    """Copy weights from the reference AudioLDM ``UNetModel``
    (audioldm/latent_diffusion/openaimodel.py:432) into
    ``v2ap_tpu.models.latent_diffusion.UNet2D`` in place.

    Layout moves: Conv2d (out,in,kh,kw) -> (kh,kw,in,out); 1x1 convs land in
    ``nnx.Linear`` (in,out); torch NCHW modules map onto the NHWC UNet."""
    from v2ap_tpu.models import latent_diffusion as ldm

    def lin(jmod, tmod):
        jmod.kernel[...] = _t2j(tmod.weight).T
        if getattr(tmod, "bias", None) is not None:
            jmod.bias[...] = _t2j(tmod.bias)

    def conv(jmod, tmod):
        jmod.kernel[...] = jnp.transpose(_t2j(tmod.weight), (2, 3, 1, 0))
        jmod.bias[...] = _t2j(tmod.bias)

    def conv1x1_as_linear(jmod, tmod):
        jmod.kernel[...] = _t2j(tmod.weight)[:, :, 0, 0].T
        jmod.bias[...] = _t2j(tmod.bias)

    def norm(jmod, tmod):
        jmod.scale[...] = _t2j(tmod.weight)
        jmod.bias[...] = _t2j(tmod.bias)

    def resblock(jmod, tmod):
        norm(jmod.norm1, tmod.in_layers[0])
        conv(jmod.conv1, tmod.in_layers[2])
        lin(jmod.emb, tmod.emb_layers[1])
        norm(jmod.norm2, tmod.out_layers[0])
        conv(jmod.conv2, tmod.out_layers[3])
        if jmod.skip is not None:
            conv1x1_as_linear(jmod.skip, tmod.skip_connection)

    def attention(jmod, tmod):
        lin(jmod.to_q, tmod.to_q)
        lin(jmod.to_k, tmod.to_k)
        lin(jmod.to_v, tmod.to_v)
        lin(jmod.to_out, tmod.to_out[0])

    def spatial(jmod, tmod):
        norm(jmod.norm, tmod.norm)
        conv1x1_as_linear(jmod.proj_in, tmod.proj_in)
        conv1x1_as_linear(jmod.proj_out, tmod.proj_out)
        for jb, tb in zip(jmod.blocks, tmod.transformer_blocks):
            norm(jb.norm1, tb.norm1)
            norm(jb.norm2, tb.norm2)
            norm(jb.norm3, tb.norm3)
            attention(jb.attn1, tb.attn1)
            attention(jb.attn2, tb.attn2)
            lin(jb.ff.proj, tb.ff.net[0].proj)
            lin(jb.ff.out, tb.ff.net[2])

    def block(jblk, tseq):
        for jl, tl in zip(jblk.layers, tseq):
            tname = type(tl).__name__
            if isinstance(jl, ldm.ResBlock):
                assert tname == "ResBlock", tname
                resblock(jl, tl)
            elif isinstance(jl, ldm.SpatialTransformer):
                assert tname == "SpatialTransformer", tname
                spatial(jl, tl)
            elif isinstance(jl, ldm.Downsample):
                assert tname == "Downsample", tname
                conv(jl.conv, tl.op)
            elif isinstance(jl, ldm.Upsample):
                assert tname == "Upsample", tname
                conv(jl.conv, tl.conv)
        assert len(jblk.layers) == len(tseq), (len(jblk.layers), len(tseq))

    lin(jax_unet.time_dense1, torch_unet.time_embed[0])
    lin(jax_unet.time_dense2, torch_unet.time_embed[2])
    if jax_unet.cfg.film_dim:
        lin(jax_unet.film_emb, torch_unet.film_emb)
    conv(jax_unet.conv_in, torch_unet.input_blocks[0][0])
    assert len(jax_unet.input_blocks) == len(torch_unet.input_blocks) - 1
    for jblk, tseq in zip(jax_unet.input_blocks, list(torch_unet.input_blocks)[1:]):
        block(jblk, tseq)
    block(jax_unet.middle_block, torch_unet.middle_block)
    assert len(jax_unet.output_blocks) == len(torch_unet.output_blocks)
    for jblk, tseq in zip(jax_unet.output_blocks, torch_unet.output_blocks):
        block(jblk, tseq)
    norm(jax_unet.norm_out, torch_unet.out[0])
    conv(jax_unet.conv_out, torch_unet.out[2])


def load_ldm_unet_from_state_dict(state_dict, jax_unet,
                                  prefix: str = "") -> None:
    """Copy an AudioLDM UNet state_dict (torch key layout, e.g. the
    ``model.diffusion_model.*`` subtree of an audioldm-s-full checkpoint —
    pass ``prefix="model.diffusion_model."``) into
    ``v2ap_tpu.models.latent_diffusion.UNet2D`` without instantiating the
    reference torch modules."""
    from v2ap_tpu.models import latent_diffusion as ldm

    sd = {}
    for k, v in state_dict.items():
        if not k.startswith(prefix):
            continue
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k[len(prefix):]] = jnp.asarray(v)

    def lin(jmod, key):
        jmod.kernel[...] = sd[f"{key}.weight"].T
        if f"{key}.bias" in sd and getattr(jmod, "bias", None) is not None:
            jmod.bias[...] = sd[f"{key}.bias"]

    def conv(jmod, key):
        jmod.kernel[...] = jnp.transpose(sd[f"{key}.weight"], (2, 3, 1, 0))
        jmod.bias[...] = sd[f"{key}.bias"]

    def conv1x1(jmod, key):
        jmod.kernel[...] = sd[f"{key}.weight"][:, :, 0, 0].T
        jmod.bias[...] = sd[f"{key}.bias"]

    def norm(jmod, key):
        jmod.scale[...] = sd[f"{key}.weight"]
        jmod.bias[...] = sd[f"{key}.bias"]

    def layer_key(jl, p, j):
        """Copy one layer of a TimestepEmbedSequential at torch index j."""
        k = f"{p}.{j}"
        if isinstance(jl, ldm.ResBlock):
            norm(jl.norm1, f"{k}.in_layers.0")
            conv(jl.conv1, f"{k}.in_layers.2")
            lin(jl.emb, f"{k}.emb_layers.1")
            norm(jl.norm2, f"{k}.out_layers.0")
            conv(jl.conv2, f"{k}.out_layers.3")
            if jl.skip is not None:
                conv1x1(jl.skip, f"{k}.skip_connection")
        elif isinstance(jl, ldm.SpatialTransformer):
            norm(jl.norm, f"{k}.norm")
            conv1x1(jl.proj_in, f"{k}.proj_in")
            conv1x1(jl.proj_out, f"{k}.proj_out")
            for t, jb in enumerate(jl.blocks):
                bk = f"{k}.transformer_blocks.{t}"
                for nm in ("norm1", "norm2", "norm3"):
                    norm(getattr(jb, nm), f"{bk}.{nm}")
                for at in ("attn1", "attn2"):
                    ja = getattr(jb, at)
                    lin(ja.to_q, f"{bk}.{at}.to_q")
                    lin(ja.to_k, f"{bk}.{at}.to_k")
                    lin(ja.to_v, f"{bk}.{at}.to_v")
                    lin(ja.to_out, f"{bk}.{at}.to_out.0")
                lin(jb.ff.proj, f"{bk}.ff.net.0.proj")
                lin(jb.ff.out, f"{bk}.ff.net.2")
        elif isinstance(jl, ldm.Downsample):
            conv(jl.conv, f"{k}.op")
        elif isinstance(jl, ldm.Upsample):
            conv(jl.conv, f"{k}.conv")

    lin(jax_unet.time_dense1, "time_embed.0")
    lin(jax_unet.time_dense2, "time_embed.2")
    if jax_unet.cfg.film_dim:
        lin(jax_unet.film_emb, "film_emb")
    conv(jax_unet.conv_in, "input_blocks.0.0")
    for i, jblk in enumerate(jax_unet.input_blocks):
        for j, jl in enumerate(jblk.layers):
            layer_key(jl, f"input_blocks.{i + 1}", j)
    for j, jl in enumerate(jax_unet.middle_block.layers):
        layer_key(jl, "middle_block", j)
    for i, jblk in enumerate(jax_unet.output_blocks):
        for j, jl in enumerate(jblk.layers):
            layer_key(jl, f"output_blocks.{i}", j)
    norm(jax_unet.norm_out, "out.0")
    conv(jax_unet.conv_out, "out.2")

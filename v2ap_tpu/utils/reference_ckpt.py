"""Converter for the reference's published CFM checkpoints
(``lshzhm/Video-to-Audio-and-Piano`` -> ``torch.load(ckpt)["model_state_dict"]``,
reference app.py:161-168) into this framework's CFM model.

The reference model is torch + x_transformers; its state-dict layout (for the
shipped config: if_cross_attn=True, if_audio_conv=True, if_text_conv=True,
text_depth == depth) is:

  transformer.abs_pos_emb.weight                  (max_seq_len, dim)
  transformer.registers / text_registers / frames_registers
  transformer.time_cond_mlp.{0.weights, 1.weight, 1.bias}
  transformer.layers.{i}.0.{idx}   speech modules:
      0 skip_proj (later half) | 1 dwconv .dw_conv1d.0 | 2 attn_norm.to_gamma
      3 attn (to_q/to_k/to_v/to_out[.0]/to_v_head_gate) | 4 adaln.to_gamma
      5 cross_norm.to_gamma | 6 cross attn | 7 adaln2 | 8 ff_norm.to_gamma
      9 ff (.ff.0.proj + .ff.2) | 10 adaln_ff
  transformer.layers.{i}.1.{idx}   text modules:
      0 dwconv | 1 norm.g | 2 attn | 3 ff_norm.g | 4 ff | 5 cross_condition
        (.text_frames_to_audio/.audio_to_text/.audio_to_frames)
  transformer.layers.{i}.2.{idx}   frames modules: 0 dwconv | 1 norm.g
      | 2 attn | 3 ff_norm.g | 4 ff
  transformer.final_norm.g
  proj_in / cond_proj_in / to_pred / proj_frames (.weight/.bias)
  video2roll_net.*                               (trained piano net)
  text_encoder2.* / image_encoder.*              (frozen T5/CLIP copies)

This converter is defensive: every lookup tries the known historical name
variants of x_transformers modules, unexpected keys are reported, and every
shape is checked. Offline round-trip testing against the real torch model is
impossible in this environment (x_transformers is not installed) — the layout
above is validated by tests against a synthetic manifest; run
``verify_reference_checkpoint`` once on the real file when available.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp


class MissingKey(KeyError):
    pass


class _SD:
    """State-dict view with candidate-name resolution + usage tracking."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def get(self, *candidates: str) -> np.ndarray:
        for c in candidates:
            if c in self.sd:
                self.used.add(c)
                return self.sd[c]
        raise MissingKey(f"none of {candidates} in checkpoint")

    def has(self, *candidates: str) -> bool:
        return any(c in self.sd for c in candidates)

    def unused(self, prefix: str = "") -> List[str]:
        return [k for k in self.sd if k.startswith(prefix)
                and k not in self.used]


def _set_linear(jmod, sd: _SD, key: str, bias: bool | None = None):
    w = sd.get(f"{key}.weight")
    jmod.kernel[...] = jnp.asarray(w.T)
    if bias is not False and sd.has(f"{key}.bias"):
        jmod.bias[...] = jnp.asarray(sd.get(f"{key}.bias"))


def _rope_permute(w: np.ndarray, heads: int, dim_head: int,
                  rot_dim: int) -> np.ndarray:
    """Reorder q/k projection OUTPUT rows from the reference's interleaved
    (GPT-J) rotary layout to this framework's half-split (NeoX) layout.

    x-transformers 1.37.4 (the reference's pinned version,
    /root/reference/requirements.txt:19) duplicates each rotary frequency
    onto ADJACENT feature pairs (2i, 2i+1); `ops.rope` pairs (i, i + d/2)
    instead, which is lane-friendlier on TPU. The two rotations are related
    by a fixed per-head feature permutation P (R_neox = P R_gptj P^T), so
    pre-permuting the checkpoint's q/k rows by P makes the attention logits
    bit-equivalent: q'·k' = (P R q)·(P R k) = (R q)·(R k). v / out / gates
    are untouched. Verified end to end by
    tests/test_reference_forward_parity.py against the reference's executed
    forward. Only rotary-receiving (self-attention) projections need this;
    cross-attention gets no rotary and is loaded verbatim.

    ``rot_dim`` is the rotary table width — the reference constructs ALL
    three streams' RotaryEmbedding from the AUDIO ``dim_head``
    (e2_tts_crossatt3.py:777-781), so a stream with wider heads gets partial
    rotary and only its first ``rot_dim`` features per head are permuted."""
    inner = heads * dim_head
    assert w.shape[0] == inner, (w.shape, heads, dim_head)
    assert rot_dim % 2 == 0 and rot_dim <= dim_head, (rot_dim, dim_head)
    idx = np.arange(inner).reshape(heads, dim_head)
    rot, tail = idx[:, :rot_dim], idx[:, rot_dim:]
    perm = np.concatenate([rot[:, 0::2], rot[:, 1::2], tail],
                          axis=1).reshape(-1)
    return w[perm]


def _set_attention(attn, sd: _SD, key: str, *, rotary: bool = True,
                   rot_dim: int | None = None):
    q = sd.get(f"{key}.to_q.weight")
    k = sd.get(f"{key}.to_k.weight")
    v = sd.get(f"{key}.to_v.weight")
    if rotary:
        # clamp to the head width: a rope table wider than the head would
        # crash the reference (see models/transformer.py rope-table note)
        rd = attn.dim_head if rot_dim is None else min(rot_dim, attn.dim_head)
        q = _rope_permute(q, attn.heads, attn.dim_head, rd)
        k = _rope_permute(k, attn.heads, attn.dim_head, rd)
    if attn.fused_qkv:
        attn.to_qkv.kernel[...] = jnp.asarray(
            np.concatenate([q.T, k.T, v.T], axis=1))
    else:
        attn.to_q.kernel[...] = jnp.asarray(q.T)
        attn.to_k.kernel[...] = jnp.asarray(k.T)
        attn.to_v.kernel[...] = jnp.asarray(v.T)
    out_w = sd.get(f"{key}.to_out.weight", f"{key}.to_out.0.weight")
    attn.to_out.kernel[...] = jnp.asarray(out_w.T)
    if attn.to_v_gates is not None:
        gw = sd.get(f"{key}.to_v_head_gate.weight",
                    f"{key}.to_v_gates.weight",
                    f"{key}.to_value_head_gates.weight")
        attn.to_v_gates.kernel[...] = jnp.asarray(gw.T)
        if sd.has(f"{key}.to_v_head_gate.bias", f"{key}.to_v_gates.bias",
                  f"{key}.to_value_head_gates.bias"):
            attn.to_v_gates.bias[...] = jnp.asarray(
                sd.get(f"{key}.to_v_head_gate.bias", f"{key}.to_v_gates.bias",
                       f"{key}.to_value_head_gates.bias"))


def _set_ff(ff, sd: _SD, key: str):
    _set_linear(ff.proj_in, sd, f"{key}.ff.0.proj")
    _set_linear(ff.proj_out, sd, f"{key}.ff.2")


def _set_dwconv(conv, sd: _SD, key: str):
    w = sd.get(f"{key}.dw_conv1d.0.weight")          # (dim, 1, k)
    conv.kernel[...] = jnp.asarray(np.transpose(w, (2, 1, 0)))
    conv.bias[...] = jnp.asarray(sd.get(f"{key}.dw_conv1d.0.bias"))


def _set_rmsnorm(norm, sd: _SD, key: str):
    norm.g[...] = jnp.asarray(sd.get(f"{key}.g", f"{key}.gamma",
                                     f"{key}.weight"))


def _set_adanorm(norm, sd: _SD, key: str):
    norm.to_gamma.kernel[...] = jnp.asarray(sd.get(f"{key}.to_gamma.weight").T)


def _set_adaln_zero(gate, sd: _SD, key: str):
    gate.to_gamma.kernel[...] = jnp.asarray(sd.get(f"{key}.to_gamma.weight").T)
    gate.to_gamma.bias[...] = jnp.asarray(sd.get(f"{key}.to_gamma.bias"))


def _speech_index_map(if_audio_conv: bool, if_cross_attn: bool) -> Dict[str, int]:
    """Position of each speech module in ``layers.{i}.0`` for a config
    (reference ModuleList construction, e2_tts_crossatt3.py:822-872)."""
    order = ["skip"]
    if if_audio_conv:
        order.append("conv")
    order += ["attn_norm", "attn", "attn_gate"]
    if if_cross_attn:
        order += ["cross_norm", "cross", "cross_gate"]
    order += ["ff_norm", "ff", "ff_gate"]
    return {name: i for i, name in enumerate(order)}


def _text_index_map(if_text_conv: bool) -> Dict[str, int]:
    """Positions in ``layers.{i}.1`` (reference :893-906)."""
    order = (["conv"] if if_text_conv else []) + [
        "attn_norm", "attn", "ff_norm", "ff", "cross"]
    return {name: i for i, name in enumerate(order)}


def _set_cross_condition_two_stream(cc, sd: _SD, key: str, cfg) -> None:
    """Embed a two-stream (crossatt/crossatt6) TextAudioCrossCondition —
    ``text_to_audio``: (dim, dim+dim_text), ``audio_to_text`` — into the
    tri-stream module by zeroing the frames columns/projection, which makes
    the frames stream exactly inert (the two-stream forward packs only
    (audio, text); reference e2_tts_crossatt.py:656-673)."""
    w = sd.get(f"{key}.text_to_audio.weight")           # (dim, dim+dim_text)
    full = np.zeros((cfg.dim, cfg.dim + cfg.dim_text + cfg.dim_frames),
                    w.dtype)
    full[:, : cfg.dim + cfg.dim_text] = w
    cc.to_audio.kernel[...] = jnp.asarray(full.T)
    if cc.cond_audio_to_others:
        cc.to_text.kernel[...] = jnp.asarray(
            sd.get(f"{key}.audio_to_text.weight").T)
        cc.to_frames.kernel[...] = jnp.zeros_like(cc.to_frames.kernel[...])


def load_cfm_from_reference_state_dict(sd_raw: Dict[str, np.ndarray], cfm,
                                       strict: bool = False) -> List[str]:
    """Populate a ``models.cfm.CFM`` from the reference checkpoint's
    ``model_state_dict``. Returns the list of checkpoint keys that were not
    consumed (frozen encoder copies are expected there). ``strict`` raises on
    any unconsumed trainable-core key."""
    sd = _SD(sd_raw)
    t = cfm.transformer
    cfg = cfm.cfg

    # index maps follow the reference's conditional ModuleList construction
    # (e2_tts_crossatt3.py:822-933): dropping if_audio_conv / if_cross_attn /
    # if_text_conv removes entries and shifts every later index.
    speech_idx = _speech_index_map(cfg.if_audio_conv, cfg.if_cross_attn)
    text_idx = _text_index_map(cfg.if_text_conv)
    # two-stream checkpoints (crossatt / crossatt6 variants) have no frames
    # stream: cross-condition key is `text_to_audio` over (audio, text) only
    two_stream = not sd.has(
        "transformer.layers.0.1."
        f"{text_idx['cross']}.text_frames_to_audio.weight")

    if sd.has("transformer.abs_pos_emb.weight") and t.abs_pos_emb is not None:
        t.abs_pos_emb.embedding[...] = jnp.asarray(
            sd.get("transformer.abs_pos_emb.weight"))
    t.registers[...] = jnp.asarray(sd.get("transformer.registers"))
    t.text_registers[...] = jnp.asarray(sd.get("transformer.text_registers"))
    if not two_stream:
        t.frames_registers[...] = jnp.asarray(
            sd.get("transformer.frames_registers"))

    t.time_mlp.fourier.weights[...] = jnp.asarray(
        sd.get("transformer.time_cond_mlp.0.weights"))
    _set_linear(t.time_mlp.proj, sd, "transformer.time_cond_mlp.1")

    half = cfg.depth // 2
    for i in range(cfg.depth):
        sp = f"transformer.layers.{i}.0"
        blk = t.audio_blocks[i]
        if i >= half:
            _set_linear(blk.skip_proj, sd, f"{sp}.{speech_idx['skip']}",
                        bias=False)
        if "conv" in speech_idx and blk.conv is not None:
            _set_dwconv(blk.conv, sd, f"{sp}.{speech_idx['conv']}")
        _set_adanorm(blk.attn_norm, sd, f"{sp}.{speech_idx['attn_norm']}")
        _set_attention(blk.attn, sd, f"{sp}.{speech_idx['attn']}")
        _set_adaln_zero(blk.attn_gate, sd, f"{sp}.{speech_idx['attn_gate']}")
        if "cross_norm" in speech_idx and blk.cross_attn is not None:
            _set_adanorm(blk.cross_norm, sd,
                         f"{sp}.{speech_idx['cross_norm']}")
            # cross-attention q/k rows are permuted TOO: with a context,
            # x_transformers applies no rope and the shared permutation
            # cancels in q·k; without one (promptless serving) attn2 runs as
            # rotary self-attention and needs the same convention fix-up as
            # the self-attention projections.
            _set_attention(blk.cross_attn, sd, f"{sp}.{speech_idx['cross']}")
            _set_adaln_zero(blk.cross_gate, sd,
                            f"{sp}.{speech_idx['cross_gate']}")
        _set_adanorm(blk.ff_norm, sd, f"{sp}.{speech_idx['ff_norm']}")
        _set_ff(blk.ff, sd, f"{sp}.{speech_idx['ff']}")
        _set_adaln_zero(blk.ff_gate, sd, f"{sp}.{speech_idx['ff_gate']}")

        if i < cfg.text_depth:
            tp = f"transformer.layers.{i}.1"
            tb = t.text_blocks[i]
            if "conv" in text_idx and tb.conv is not None:
                _set_dwconv(tb.conv, sd, f"{tp}.{text_idx['conv']}")
            _set_rmsnorm(tb.attn_norm, sd, f"{tp}.{text_idx['attn_norm']}")
            _set_attention(tb.attn, sd, f"{tp}.{text_idx['attn']}",
                           rot_dim=cfg.dim_head)
            _set_rmsnorm(tb.ff_norm, sd, f"{tp}.{text_idx['ff_norm']}")
            _set_ff(tb.ff, sd, f"{tp}.{text_idx['ff']}")
            cc = t.cross_conditions[i]
            ccp = f"{tp}.{text_idx['cross']}"
            if two_stream:
                _set_cross_condition_two_stream(cc, sd, ccp, cfg)
            else:
                _set_linear(cc.to_audio, sd, f"{ccp}.text_frames_to_audio",
                            bias=False)
                if cc.cond_audio_to_others:
                    _set_linear(cc.to_text, sd, f"{ccp}.audio_to_text",
                                bias=False)
                    _set_linear(cc.to_frames, sd, f"{ccp}.audio_to_frames",
                                bias=False)

        fp = f"transformer.layers.{i}.2"
        if not two_stream:
            fb = t.frames_blocks[i]
            _set_dwconv(fb.conv, sd, f"{fp}.0")
            _set_rmsnorm(fb.attn_norm, sd, f"{fp}.1")
            _set_attention(fb.attn, sd, f"{fp}.2", rot_dim=cfg.dim_head)
            _set_rmsnorm(fb.ff_norm, sd, f"{fp}.3")
            _set_ff(fb.ff, sd, f"{fp}.4")

    _set_rmsnorm(t.final_norm, sd, "transformer.final_norm")

    _set_linear(cfm.proj_in, sd, "proj_in")
    if cfm.cond_proj_in is not None and sd.has("cond_proj_in.weight"):
        _set_linear(cfm.cond_proj_in, sd, "cond_proj_in")
    _set_linear(cfm.to_pred, sd, "to_pred")
    if sd.has("proj_frames.weight"):
        _set_linear(cfm.proj_frames, sd, "proj_frames")
    elif two_stream:
        # no frames stream in the checkpoint: make ours provably inert
        cfm.proj_frames.kernel[...] = jnp.zeros_like(
            cfm.proj_frames.kernel[...])
        cfm.proj_frames.bias[...] = jnp.zeros_like(cfm.proj_frames.bias[...])
    if cfm.proj_text is not None and sd.has("proj_text.weight"):
        _set_linear(cfm.proj_text, sd, "proj_text")   # "mixed" encoder mode

    # trained piano-perception net (flat-key variant of the module converter)
    if cfm.video2roll is not None and sd.has("video2roll_net.conv1.weight"):
        _load_video2roll_flat(sd, "video2roll_net", cfm.video2roll)

    leftovers = sd.unused()
    if strict:
        core = [k for k in leftovers
                if not k.startswith(("text_encoder2.", "image_encoder.",
                                     "vocos.", "mel_spec.", "embed_text.",
                                     "duration_predictor.",
                                     # variant-6 FactorCL tower: converted
                                     # separately into training.contrastive
                                     "transformer.contrastive_loss."))]
        if core:
            raise MissingKey(f"unconsumed trainable-core keys: {core[:10]}")
    return leftovers


def _load_video2roll_flat(sd: _SD, prefix: str, jnet) -> None:
    def conv(jmod, key):
        jmod.kernel[...] = jnp.asarray(
            np.transpose(sd.get(f"{prefix}.{key}.weight"), (2, 3, 1, 0)))
        if sd.has(f"{prefix}.{key}.bias"):
            jmod.bias[...] = jnp.asarray(sd.get(f"{prefix}.{key}.bias"))

    def bn(jmod, key):
        jmod.scale[...] = jnp.asarray(sd.get(f"{prefix}.{key}.weight"))
        jmod.bias[...] = jnp.asarray(sd.get(f"{prefix}.{key}.bias"))
        jmod.mean[...] = jnp.asarray(sd.get(f"{prefix}.{key}.running_mean"))
        jmod.var[...] = jnp.asarray(sd.get(f"{prefix}.{key}.running_var"))

    def convbn(jmod, ck, bk):
        conv(jmod.conv, ck)
        bn(jmod.bn, bk)

    def linear(jmod, key):
        jmod.kernel[...] = jnp.asarray(sd.get(f"{prefix}.{key}.weight").T)
        jmod.bias[...] = jnp.asarray(sd.get(f"{prefix}.{key}.bias"))

    convbn(jnet.stem, "conv1", "bn1")
    for li, layer in enumerate((jnet.layer1, jnet.layer2, jnet.layer3,
                                jnet.layer4), start=1):
        for bi, blk in enumerate(layer):
            p = f"layer{li}.{bi}"
            convbn(blk.cb1, f"{p}.conv1", f"{p}.bn1")
            convbn(blk.cb2, f"{p}.conv2", f"{p}.bn2")
            if blk.down is not None:
                convbn(blk.down, f"{p}.downsample.0", f"{p}.downsample.1")
    for jftb, key in ((jnet.ftb2_1, "FTB2_1"), (jnet.ftb2_2, "FTB2_2"),
                      (jnet.ftb3, "FTB3"), (jnet.ftb4, "FTB4")):
        conv(jftb.conv0, f"{key}.conv0")
        convbn(jftb.cb1, f"{key}.conv1", f"{key}.bn1")
        conv(jftb.conv2, f"{key}.conv2")
    for jfrb, key in ((jnet.frb2, "FRB2"), (jnet.frb3, "FRB3"),
                      (jnet.frb4, "FRB4")):
        linear(jfrb.fc1, f"{key}.fc1")
        linear(jfrb.fc2, f"{key}.fc2")
    convbn(jnet.toplayer, "toplayer", "toplayer_bn")
    conv(jnet.conv2, "conv2")
    linear(jnet.fc, "fc")


def load_reference_checkpoint(path: str, cfm, strict: bool = False) -> List[str]:
    """torch.load the published .pt and populate ``cfm``."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    return load_cfm_from_reference_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfm, strict=strict)

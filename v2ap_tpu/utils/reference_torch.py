"""Offline loader for the reference's torch model files, with executable
x_transformers stand-ins.

The reference (/root/reference/src/e2_tts_pytorch/e2_tts_crossatt*.py) depends
on packages absent from this image. Key-structure stubs were enough for the
checkpoint-key audit (scripts/derive_reference_keys.py); THIS module goes
further and gives the x_transformers leaves a full **forward math**
transcription so the reference's own ``Transformer.forward`` (its real code,
e2_tts_crossatt3.py:941-1143) can be executed and compared numerically against
the JAX tri-stream transformer (tests/test_reference_forward_parity.py).

The transcription targets **x-transformers==1.37.4** — the exact version the
reference pins (/root/reference/requirements.txt:19). Semantics carried over:

  * RMSNorm: ``F.normalize(x, dim=-1) * sqrt(dim) * g``.
  * AdaptiveRMSNorm: zero-init bias-free ``to_gamma``; ``normed * (gamma+1)``.
  * FeedForward(glu=True): GLU(Linear(dim, 2*inner), GELU-exact) -> Dropout ->
    Linear(inner, dim); filtered-Sequential indices ff.0 / ff.2.
  * Attention(gate_value_heads=True, softclamp_logits=True): bias-free
    q/k/v/out projections; rotary applied to q and k **only when no context**;
    logits scaled by dim_head**-0.5 then soft-clamped ``50*tanh(s/50)`` BEFORE
    the key-padding mask fill; softmax; per-head sigmoid output gates
    ``to_v_head_gate`` computed from the *query* input; masked query rows
    zeroed after ``to_out``.
  * RotaryEmbedding: GPT-J **interleaved** pairing — freqs duplicated by
    ``stack((f, f), -1).reshape(..., d)`` and ``rotate_half`` swapping adjacent
    pairs ("partial rotary embeddings, Wang et al. GPT-J" in the 1.37.4
    source). NOTE: the JAX side uses the TPU-lane-friendlier half-split (NeoX)
    layout instead; exact equivalence is restored by permuting q/k projection
    rows in the checkpoint converter (utils/reference_ckpt._rope_permute).

This file is the ONE transcription trust point for cross-implementation
parity (PARITY.md "x_transformers residual unknown"): everything else in the
parity test — stream ordering, cross-condition, U-Net skips, registers,
AdaLN-Zero, depthwise conv, fourier time embedding — runs the reference's own
executed code.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import os
import sys
import types

REF_ROOT = os.environ.get("V2AP_REFERENCE_ROOT", "/root/reference")
REF_SRC = os.path.join(REF_ROOT, "src", "e2_tts_pytorch")

VARIANT_FILES = {
    "crossatt": "e2_tts_crossatt.py",
    "crossatt6": "e2_tts_crossatt6.py",
    "crossatt3": "e2_tts_crossatt3.py",
    "crossatt3_2": "e2_tts_crossatt3_2.py",
}


def reference_available() -> bool:
    return os.path.isdir(REF_SRC)


def _real_package(name: str) -> bool:
    try:
        return importlib.util.find_spec(name.split(".")[0]) is not None
    except (ImportError, ValueError):
        return False


def _mod(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_reference_stubs() -> None:
    """Install import stand-ins for every package the reference model files
    need but this image lacks. x_transformers leaves carry BOTH the
    state-dict structure and the 1.37.4 forward math; einx carries working
    ``where``/``multiply`` for the exact patterns the reference uses
    (DepthwiseConv masking :518-526, RandomFourierEmbed :562)."""
    import torch
    from torch import nn
    import torch.nn.functional as F

    # never shadow a genuinely-installed package (stubs win only over holes)
    if not _real_package("beartype"):
        _mod("beartype", beartype=lambda f: f)
    if not _real_package("jaxtyping"):
        _mod("jaxtyping", Float=object(), Int=object(), Bool=object())
    if not _real_package("moviepy"):
        mp = _mod("moviepy")
        mp.editor = _mod("moviepy.editor", AudioFileClip=object,
                         VideoFileClip=object)
    if not _real_package("g2p_en"):
        _mod("g2p_en", G2p=object)
    if not _real_package("jieba"):
        _mod("jieba", cut=lambda *a, **k: [])
    if not _real_package("pypinyin"):
        _mod("pypinyin", lazy_pinyin=lambda *a, **k: [], Style=object)
    if not _real_package("audioldm") and "audioldm" not in sys.modules:
        al = _mod("audioldm")
        al.audio = _mod("audioldm.audio")
        al.audio.stft = _mod("audioldm.audio.stft", TacotronSTFT=object)
        al.variational_autoencoder = _mod("audioldm.variational_autoencoder",
                                          AutoencoderKL=object)
        al.utils = _mod("audioldm.utils",
                        default_audioldm_config=lambda *a, **k: {},
                        get_metadata=lambda *a, **k: {})
    if not _real_package("torchaudio"):
        ta = _mod("torchaudio")
        ta.functional = _mod("torchaudio.functional",
                             DB_to_amplitude=lambda *a: None)
        ta.transforms = _mod("torchaudio.transforms", MelSpectrogram=object)
    if not _real_package("torchdiffeq"):
        _mod("torchdiffeq", odeint=lambda *a, **k: None)
    if not _real_package("vocos"):
        _mod("vocos", Vocos=object)
    if not _real_package("torchvision"):
        tv = _mod("torchvision")
        tv.transforms = _mod(
            "torchvision.transforms",
            Compose=lambda fns: fns, ToTensor=object, Normalize=object,
            transforms=None)

    # ---- einx: the two call patterns the reference actually uses ----------
    def einx_where(pattern, mask, x, fill):
        assert pattern.replace(" ", "") == "bn,bnd,->bnd", pattern
        fill_t = torch.as_tensor(fill, dtype=x.dtype, device=x.device)
        return torch.where(mask.bool().unsqueeze(-1), x, fill_t)

    def einx_multiply(pattern, a, b):
        assert pattern.replace(" ", "") == "i,j->ij", pattern
        return a.unsqueeze(-1) * b

    if not _real_package("einx"):
        _mod("einx", where=einx_where, multiply=einx_multiply)

    if _real_package("x_transformers"):
        # the real thing beats any transcription — use it untouched
        return

    # ---- x_transformers @ 1.37.4 ------------------------------------------

    def rotate_half(x):
        # interleaved pairs: '... (d r) -> ... d r', r = 2
        x = x.reshape(*x.shape[:-1], -1, 2)
        x1, x2 = x.unbind(dim=-1)
        x = torch.stack((-x2, x1), dim=-1)
        return x.reshape(*x.shape[:-2], -1)

    def apply_rotary_pos_emb(t, freqs, scale=1.0):
        rot_dim, seq_len = freqs.shape[-1], t.shape[-2]
        freqs = freqs[-seq_len:, :]
        t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
        t_rot = (t_rot * freqs.cos() * scale) + (
            rotate_half(t_rot) * freqs.sin() * scale)
        return torch.cat((t_rot, t_pass), dim=-1)

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim, **kw):
            super().__init__()
            inv = 1.0 / (10000 ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("inv_freq", inv, persistent=False)

        def forward_from_seq_len(self, seq_len):
            t = torch.arange(seq_len, device=self.inv_freq.device)
            return self.forward(t)

        def forward(self, t):
            freqs = torch.einsum(
                "i,j->ij", t.type_as(self.inv_freq), self.inv_freq)
            freqs = torch.stack((freqs, freqs), dim=-1)
            freqs = freqs.reshape(*freqs.shape[:-2], -1)  # '... d r -> (d r)'
            return freqs, 1.0

    class RMSNorm(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.scale = dim ** 0.5
            self.g = nn.Parameter(torch.ones(dim))

        def forward(self, x):
            return F.normalize(x, dim=-1) * self.scale * self.g

    class AdaptiveRMSNorm(nn.Module):
        def __init__(self, dim, dim_condition=None):
            super().__init__()
            self.scale = dim ** 0.5
            dim_condition = dim_condition or dim
            self.to_gamma = nn.Linear(dim_condition, dim, bias=False)
            nn.init.zeros_(self.to_gamma.weight)

        def forward(self, x, *, condition):
            if condition.ndim == 2:
                condition = condition.unsqueeze(1)
            normed = F.normalize(x, dim=-1) * self.scale
            return normed * (self.to_gamma(condition) + 1.0)

    class GLU(nn.Module):
        def __init__(self, dim_in, dim_out, activation):
            super().__init__()
            self.act = activation
            self.proj = nn.Linear(dim_in, dim_out * 2)

        def forward(self, x):
            x, gate = self.proj(x).chunk(2, dim=-1)
            return x * self.act(gate)

    class FeedForward(nn.Module):
        """glu=True path; 1.37.4 filters None entries out of its Sequential,
        so the leaf indices are ff.0 (GLU) / ff.1 (Dropout) / ff.2 (Linear)."""

        def __init__(self, dim, dim_out=None, mult=4, glu=False,
                     dropout=0.0, **kw):
            super().__init__()
            inner = int(dim * mult)
            dim_out = dim_out or dim
            if glu:
                project_in = GLU(dim, inner, nn.GELU())
            else:
                project_in = nn.Sequential(nn.Linear(dim, inner), nn.GELU())
            self.ff = nn.Sequential(project_in, nn.Dropout(dropout),
                                    nn.Linear(inner, dim_out))

        def forward(self, x):
            return self.ff(x)

    class Attention(nn.Module):
        def __init__(self, dim, heads=8, dim_head=64, dropout=0.0,
                     gate_value_heads=False, softclamp_logits=False,
                     logit_softclamp_value=50.0, **kw):
            super().__init__()
            inner = heads * dim_head
            self.heads = heads
            self.scale = dim_head ** -0.5
            self.softclamp_logits = softclamp_logits
            self.logit_softclamp_value = logit_softclamp_value
            self.to_q = nn.Linear(dim, inner, bias=False)
            self.to_k = nn.Linear(dim, inner, bias=False)
            self.to_v = nn.Linear(dim, inner, bias=False)
            self.to_v_head_gate = (nn.Linear(dim, heads)
                                   if gate_value_heads else None)
            self.to_out = nn.Linear(inner, dim, bias=False)
            self.dropout = nn.Dropout(dropout)

        def forward(self, x, context=None, mask=None, context_mask=None,
                    rotary_pos_emb=None, **kw):
            b, n, _ = x.shape
            has_context = context is not None
            kv_input = context if has_context else x
            split = lambda t: t.reshape(b, t.shape[1], self.heads, -1
                                        ).transpose(1, 2)
            q = split(self.to_q(x))
            k = split(self.to_k(kv_input))
            v = split(self.to_v(kv_input))

            if rotary_pos_emb is not None and not has_context:
                freqs, xpos_scale = rotary_pos_emb
                q = apply_rotary_pos_emb(q, freqs, 1.0)
                k = apply_rotary_pos_emb(k, freqs, 1.0)

            input_mask = context_mask if has_context else mask

            sim = torch.einsum("bhid,bhjd->bhij", q, k) * self.scale
            if self.softclamp_logits:
                v_clamp = self.logit_softclamp_value
                sim = torch.tanh(sim / v_clamp) * v_clamp
            if input_mask is not None:
                sim = sim.masked_fill(
                    ~input_mask.bool()[:, None, None, :],
                    -torch.finfo(sim.dtype).max)
            attn = sim.softmax(dim=-1)
            attn = self.dropout(attn)
            out = torch.einsum("bhij,bhjd->bhid", attn, v)

            if self.to_v_head_gate is not None:
                head_gate = self.to_v_head_gate(x)          # (b, n, h)
                out = out * head_gate.permute(0, 2, 1).unsqueeze(-1).sigmoid()

            out = out.transpose(1, 2).reshape(b, n, -1)
            out = self.to_out(out)
            if mask is not None:
                out = out.masked_fill(~mask.bool().unsqueeze(-1), 0.0)
            return out

    xt = _mod("x_transformers", Attention=Attention, FeedForward=FeedForward,
              RMSNorm=RMSNorm, AdaptiveRMSNorm=AdaptiveRMSNorm)
    _mod("x_transformers.x_transformers", RotaryEmbedding=RotaryEmbedding,
         Attention=Attention, FeedForward=FeedForward, RMSNorm=RMSNorm,
         AdaptiveRMSNorm=AdaptiveRMSNorm)
    xt.x_transformers = sys.modules["x_transformers.x_transformers"]


def import_reference_module(variant: str):
    """Import one reference model file (its REAL code) under the stubs."""
    path = os.path.join(REF_SRC, VARIANT_FILES[variant])
    name = f"ref_{variant}"
    pkg = types.ModuleType("e2_tts_pytorch")
    pkg.__path__ = [REF_SRC]
    sys.modules.setdefault("e2_tts_pytorch", pkg)
    audeo = os.path.join(REF_ROOT, "src", "audeo")
    if audeo not in sys.path:
        sys.path.insert(0, audeo)
    spec = importlib.util.spec_from_file_location(
        f"e2_tts_pytorch.{name}", path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[f"e2_tts_pytorch.{name}"] = m
    spec.loader.exec_module(m)
    return m

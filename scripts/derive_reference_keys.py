#!/usr/bin/env python
"""Derive the reference-checkpoint key inventory by EXECUTING the reference's
own model-construction code (VERDICT r2 next #5: de-circularize the
converter's key expectations).

``utils/reference_manifest.py`` hand-lists the expected checkpoint keys; the
risk is that the manifest and the converter share one author's assumptions.
This script instead imports each reference model file
(/root/reference/src/e2_tts_pytorch/e2_tts_crossatt*.py) and instantiates its
REAL ``Transformer`` class (torch runs on CPU here) with the shipped
hyperparameters (src/inference_v2a.py:74-110), then dumps
``state_dict()`` keys+shapes to tests/golden/reference_keys_<variant>.json.
The ModuleList nesting, conditional module indices, U-Net skip placement and
per-stream structure therefore come from the reference's executed
constructors — not from a hand-written list.

The ONE remaining assumption is the x_transformers leaf naming: that package
cannot be installed offline, so ``Attention`` / ``FeedForward`` / ``RMSNorm``
/ ``AdaptiveRMSNorm`` / ``RotaryEmbedding`` are stubbed below with
state-dict-faithful torch implementations transcribed from the public
x_transformers source (see PARITY.md "x_transformers residual unknown"; both
historical namings — ``to_out.weight``/``to_out.0.weight`` and
``to_v_head_gate``/``to_v_gates`` — are accepted by the converter).

E2TTS-level trained leaves (proj_in/cond_proj_in/to_pred/proj_frames and the
Video2RollNet) are added from their construction lines
(e2_tts_crossatt3.py:1362-1370,1419,1523) — E2TTS.__init__ itself downloads
HF checkpoints and cannot run offline; Video2RollNet is imported for real
from src/audeo and its state_dict dumped, not hand-listed.

Usage:  python scripts/derive_reference_keys.py [--out tests/golden]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import types

REF_ROOT = os.environ.get("V2AP_REFERENCE_ROOT", "/root/reference")
REF_SRC = os.path.join(REF_ROOT, "src", "e2_tts_pytorch")

# Shipped full-size hyperparameters (src/inference_v2a.py:74-110; variant
# deltas: e2_tts_crossatt3_2.py:74-76 NOTES=88 — NOTES is module-level in
# each file, picked up automatically on import).
TRANSFORMER_KW = dict(depth=12, dim=1024, dim_text=1280, heads=16,
                      dim_head=64, if_text_modules=True, if_cross_attn=True,
                      if_audio_conv=True, if_text_conv=True,
                      cond_on_time=True)

VARIANT_FILES = {
    "crossatt": "e2_tts_crossatt.py",
    "crossatt6": "e2_tts_crossatt6.py",
    "crossatt3": "e2_tts_crossatt3.py",
    "crossatt3_2": "e2_tts_crossatt3_2.py",
}


def install_stubs(torch, nn, F):
    """Import-time stubs for packages absent in this image. Only
    x_transformers carries state-dict structure (documented in PARITY.md);
    the rest are inert import shims (`from __future__ import annotations`
    keeps the jaxtyping signatures unevaluated)."""

    import importlib.machinery

    def mod(name, **attrs):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    mod("beartype", beartype=lambda f: f)
    mod("jaxtyping", Float=object(), Int=object(), Bool=object())
    mp = mod("moviepy")
    mp.editor = mod("moviepy.editor", AudioFileClip=object,
                    VideoFileClip=object)
    mod("g2p_en", G2p=object)
    mod("jieba", cut=lambda *a, **k: [])
    mod("pypinyin", lazy_pinyin=lambda *a, **k: [], Style=object)
    al = mod("audioldm")
    al.audio = mod("audioldm.audio")
    al.audio.stft = mod("audioldm.audio.stft", TacotronSTFT=object)
    al.variational_autoencoder = mod("audioldm.variational_autoencoder",
                                     AutoencoderKL=object)
    al.utils = mod("audioldm.utils",
                   default_audioldm_config=lambda *a, **k: {},
                   get_metadata=lambda *a, **k: {})
    ta = mod("torchaudio")
    ta.functional = mod("torchaudio.functional", DB_to_amplitude=lambda *a: None)
    ta.transforms = mod("torchaudio.transforms", MelSpectrogram=object)
    mod("torchdiffeq", odeint=lambda *a, **k: None)
    mod("einx")
    mod("vocos", Vocos=object)
    tv = mod("torchvision")
    tv.transforms = mod(
        "torchvision.transforms",
        Compose=lambda fns: fns, ToTensor=object, Normalize=object,
        transforms=None)

    # ---- x_transformers stubs (state-dict-faithful; the residual unknown) --
    class RMSNorm(nn.Module):
        """x_transformers.x_transformers.RMSNorm: unit gain param ``g``."""

        def __init__(self, dim):
            super().__init__()
            self.scale = dim ** 0.5
            self.g = nn.Parameter(torch.ones(dim))

        def forward(self, x):
            return F.normalize(x, dim=-1) * self.scale * self.g

    class AdaptiveRMSNorm(nn.Module):
        """Condition-projected gamma, zero-init, no bias (x_transformers)."""

        def __init__(self, dim, dim_condition=None):
            super().__init__()
            self.scale = dim ** 0.5
            dim_condition = dim_condition or dim
            self.to_gamma = nn.Linear(dim_condition, dim, bias=False)
            nn.init.zeros_(self.to_gamma.weight)

        def forward(self, x, *, condition):
            normed = F.normalize(x, dim=-1) * self.scale
            gamma = self.to_gamma(condition)
            return normed * (gamma + 1.0)

    class GLU(nn.Module):
        def __init__(self, dim_in, dim_out, activation):
            super().__init__()
            self.act = activation
            self.proj = nn.Linear(dim_in, dim_out * 2)

        def forward(self, x):
            x, gate = self.proj(x).chunk(2, dim=-1)
            return x * self.act(gate)

    class FeedForward(nn.Module):
        """glu=True path: ff = Sequential(GLU, Dropout, Linear) — leaf keys
        ff.0.proj.{weight,bias}, ff.2.{weight,bias}."""

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
        """q/k/v/out projections bias-free; gate_value_heads adds a
        per-head sigmoid gate Linear(dim, heads) named ``to_v_head_gate``
        (modern x_transformers; historical ``to_v_gates`` also accepted by
        the converter). softclamp_logits carries no params."""

        def __init__(self, dim, heads=8, dim_head=64, dropout=0.0,
                     gate_value_heads=False, softclamp_logits=False, **kw):
            super().__init__()
            inner = heads * dim_head
            self.to_q = nn.Linear(dim, inner, bias=False)
            self.to_k = nn.Linear(dim, inner, bias=False)
            self.to_v = nn.Linear(dim, inner, bias=False)
            if gate_value_heads:
                self.to_v_head_gate = nn.Linear(dim, heads)
            self.to_out = nn.Linear(inner, dim, bias=False)

        def forward(self, *a, **k):
            raise NotImplementedError("key-inventory stub")

    class RotaryEmbedding(nn.Module):
        def __init__(self, dim, **kw):
            super().__init__()
            inv = 1.0 / (10000 ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("inv_freq", inv, persistent=False)

    xt = mod("x_transformers", Attention=Attention, FeedForward=FeedForward,
             RMSNorm=RMSNorm, AdaptiveRMSNorm=AdaptiveRMSNorm)
    mod("x_transformers.x_transformers", RotaryEmbedding=RotaryEmbedding,
        Attention=Attention, FeedForward=FeedForward, RMSNorm=RMSNorm,
        AdaptiveRMSNorm=AdaptiveRMSNorm)
    xt.x_transformers = sys.modules["x_transformers.x_transformers"]


def import_reference_module(variant: str):
    path = os.path.join(REF_SRC, VARIANT_FILES[variant])
    name = f"ref_{variant}"
    # crossatt6 pulls its FactorCL tower via package-relative imports
    pkg = types.ModuleType("e2_tts_pytorch")
    pkg.__path__ = [REF_SRC]
    sys.modules.setdefault("e2_tts_pytorch", pkg)
    sys.path.insert(0, os.path.join(REF_ROOT, "src", "audeo"))
    spec = importlib.util.spec_from_file_location(
        f"e2_tts_pytorch.{name}", path)
    m = importlib.util.module_from_spec(spec)
    sys.modules[f"e2_tts_pytorch.{name}"] = m
    spec.loader.exec_module(m)
    return m


def derive(variant: str) -> dict:
    import torch
    from torch import nn

    ref = import_reference_module(variant)
    tf = ref.Transformer(**TRANSFORMER_KW)
    keys = {}
    for k, v in tf.state_dict().items():
        keys[f"transformer.{k}"] = list(v.shape)

    # E2TTS-level trained leaves (e2_tts_crossatt3.py:1362-1370: proj_in /
    # cond_proj_in / to_pred with concat_cond=False, if_cond_proj_in=True)
    num_channels, dim = 128, TRANSFORMER_KW["dim"]
    keys["proj_in.weight"] = [dim, num_channels]
    keys["proj_in.bias"] = [dim]
    keys["cond_proj_in.weight"] = [dim, num_channels]
    keys["cond_proj_in.bias"] = [dim]
    keys["to_pred.weight"] = [num_channels, dim]
    keys["to_pred.bias"] = [num_channels]
    # shipped config: if_embed_text=False (video_text=True,
    # inference_v2a.py:102) — no embed_text.* keys

    if variant in ("crossatt3", "crossatt3_2"):
        # proj_frames = Linear(NOTES, dim_frames) (:1419) — NOTES is the
        # variant file's module constant (51 / 88)
        notes = int(ref.NOTES)
        keys["proj_frames.weight"] = [512, notes]
        keys["proj_frames.bias"] = [512]
        # the in-model piano net (:1523) — real import, real state_dict
        import Video2RollNet
        net = Video2RollNet.resnet18(num_classes=notes)
        for k, v in net.state_dict().items():
            keys[f"video2roll_net.{k}"] = list(v.shape)
    return keys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden")
    args = ap.parse_args()
    if not os.path.isdir(REF_SRC):
        print(f"reference not found at {REF_SRC}", file=sys.stderr)
        return 2

    import torch
    from torch import nn
    import torch.nn.functional as F
    install_stubs(torch, nn, F)

    os.makedirs(args.out, exist_ok=True)
    for variant in VARIANT_FILES:
        keys = derive(variant)
        out = os.path.join(args.out, f"reference_keys_{variant}.json")
        with open(out, "w") as f:
            json.dump(keys, f, indent=0, sort_keys=True)
        print(f"{variant}: {len(keys)} keys -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

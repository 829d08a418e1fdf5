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


# The import stand-ins (x_transformers leaves with 1.37.4-faithful structure
# AND forward math, einx, moviepy, ...) and the reference-module loader live
# in v2ap_tpu/utils/reference_torch.py so the forward-parity test
# (tests/test_reference_forward_parity.py) shares one transcription. Loaded
# by file path — importing the v2ap_tpu package would pull in jax, and this
# script must run torch-only (no TPU tunnel dependency).
_rt_spec = importlib.util.spec_from_file_location(
    "_reference_torch",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 "v2ap_tpu", "utils", "reference_torch.py"))
_rt = importlib.util.module_from_spec(_rt_spec)
_rt_spec.loader.exec_module(_rt)
install_reference_stubs = _rt.install_reference_stubs
import_reference_module = _rt.import_reference_module


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
    install_reference_stubs()

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

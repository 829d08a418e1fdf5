#!/usr/bin/env python
"""One-shot conversion of the published reference weights into this
framework's orbax checkpoints.

    python scripts/convert_checkpoints.py \
        --cfm-ckpt  /path/to/piano5_4_2_8000.pt \
        --encodec   /hf/facebook-encodec_24khz \
        --t5        /hf/google-flan-t5-large \
        --clip      /hf/IP-Adapter/sdxl_models/image_encoder \
        --out       ckpts/v2ap

Each flag is optional — convert whatever you have. Frozen encoders convert
through tested parity paths (tests/test_encodec.py, tests/test_encoders.py);
the CFM core uses the documented reference layout (utils/reference_ckpt.py)
and prints an audit of unconsumed keys for manual review.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfm-ckpt", default=None,
                    help="reference .pt (model_state_dict layout)")
    ap.add_argument("--encodec", default=None, help="HF snapshot dir")
    ap.add_argument("--t5", default=None, help="HF snapshot dir")
    ap.add_argument("--clip", default=None, help="HF snapshot dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--notes", type=int, default=51,
                    help="51 (shipped) or 88 (full-keyboard variant)")
    ap.add_argument("--dinov2", default=None, help="HF snapshot dir")
    ap.add_argument("--convnext", default=None,
                    help="HF ConvNextModel snapshot dir (trunk only)")
    ap.add_argument("--pann", default=None,
                    help="Cnn14*.pth checkpoint (FAD embedder)")
    ap.add_argument("--audioldm", default=None,
                    help=".ckpt/.pt of audioldm-s-full (LDM UNet subtree)")
    ap.add_argument("--audit", action="store_true",
                    help="print a full consumed/unconsumed key report for "
                         "--cfm-ckpt and exit without writing")
    args = ap.parse_args()
    if not args.audit and not args.out:
        ap.error("--out is required unless --audit")

    from v2ap_tpu.utils.jitting import enable_compile_cache, create_model
    enable_compile_cache()
    from flax import nnx
    from v2ap_tpu import config as cfglib
    from v2ap_tpu.utils.checkpoint import save_model

    if args.audit:
        if not args.cfm_ckpt:
            ap.error("--audit requires --cfm-ckpt")
        import json

        import torch
        from v2ap_tpu.models.cfm import CFM
        from v2ap_tpu.utils.reference_manifest import audit_state_dict
        ckpt = torch.load(args.cfm_ckpt, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("model_state_dict", ckpt)
        sd = {k: v.numpy() for k, v in sd.items()}
        cfg = (cfglib.v2p_88key() if args.notes == 88 else cfglib.V2APConfig())
        cfm = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                       rngs=nnx.Rngs(0)))
        report = audit_state_dict(sd, cfm)
        print(json.dumps(report, indent=2))
        return 0 if not report["unexpected_unconsumed"] else 1

    os.makedirs(args.out, exist_ok=True)

    if args.encodec:
        from transformers import EncodecModel as HFEncodec
        from v2ap_tpu.models.encodec import EncodecModel
        from v2ap_tpu.utils.torch_convert import load_encodec_from_torch
        codec = create_model(lambda: EncodecModel(rngs=nnx.Rngs(0)))
        load_encodec_from_torch(
            HFEncodec.from_pretrained(args.encodec).eval(), codec)
        save_model(os.path.join(args.out, "encodec"), codec)
        print("converted encodec")

    if args.t5:
        from transformers import T5EncoderModel
        from v2ap_tpu.models.t5 import T5Encoder
        from v2ap_tpu.utils.torch_convert import load_t5_from_torch
        t5 = create_model(lambda: T5Encoder(rngs=nnx.Rngs(0)))
        load_t5_from_torch(T5EncoderModel.from_pretrained(args.t5).eval(), t5)
        save_model(os.path.join(args.out, "t5"), t5)
        print("converted t5")

    if args.clip:
        from transformers import CLIPVisionModelWithProjection
        from v2ap_tpu.models.clip_vit import CLIPVisionModel
        from v2ap_tpu.utils.torch_convert import load_clip_vision_from_torch
        clip = create_model(lambda: CLIPVisionModel(rngs=nnx.Rngs(0)))
        load_clip_vision_from_torch(
            CLIPVisionModelWithProjection.from_pretrained(args.clip).eval(),
            clip)
        save_model(os.path.join(args.out, "clip"), clip)
        print("converted clip")

    if args.dinov2:
        from transformers import Dinov2Model as HFDinov2
        from v2ap_tpu.models.dinov2 import Dinov2Model
        from v2ap_tpu.utils.torch_convert import load_dinov2_from_torch
        dino = create_model(lambda: Dinov2Model(rngs=nnx.Rngs(0)))
        load_dinov2_from_torch(HFDinov2.from_pretrained(args.dinov2).eval(),
                               dino)
        save_model(os.path.join(args.out, "dinov2"), dino)
        print("converted dinov2")

    if args.convnext:
        from transformers import ConvNextModel as HFConvNext
        from v2ap_tpu.models.convnext import ConvNextCLIP
        from v2ap_tpu.utils.torch_convert import load_convnext_from_torch
        cnx = create_model(lambda: ConvNextCLIP(rngs=nnx.Rngs(0)))
        load_convnext_from_torch(
            HFConvNext.from_pretrained(args.convnext).eval(), cnx)
        save_model(os.path.join(args.out, "clip_convnext"), cnx)
        print("converted convnext (trunk; pass open_clip head via "
              "torch_convert.load_convnext_from_torch head_state)")

    if args.pann:
        import torch
        from v2ap_tpu.evaluation.pann import Cnn14, load_pann_from_state_dict
        pann = create_model(lambda: Cnn14(rngs=nnx.Rngs(0)))
        ckpt = torch.load(args.pann, map_location="cpu", weights_only=False)
        load_pann_from_state_dict(ckpt.get("model", ckpt), pann)
        save_model(os.path.join(args.out, "pann"), pann)
        print("converted pann cnn14")

    if args.audioldm:
        import torch
        from v2ap_tpu.models.latent_diffusion import LatentDiffusion
        from v2ap_tpu.utils.torch_convert import load_ldm_unet_from_state_dict
        ldm = create_model(lambda: LatentDiffusion(rngs=nnx.Rngs(0)))
        ckpt = torch.load(args.audioldm, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("state_dict", ckpt)
        load_ldm_unet_from_state_dict(sd, ldm.unet,
                                      prefix="model.diffusion_model.")
        save_model(os.path.join(args.out, "audioldm_unet"), ldm)
        print("converted audioldm ldm unet")

    if args.cfm_ckpt:
        from v2ap_tpu.models.cfm import CFM
        from v2ap_tpu.utils.reference_ckpt import load_reference_checkpoint
        cfg = (cfglib.v2p_88key() if args.notes == 88 else cfglib.V2APConfig())
        cfm = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                       rngs=nnx.Rngs(0)))
        leftovers = load_reference_checkpoint(args.cfm_ckpt, cfm)
        core_left = [k for k in leftovers
                     if not k.startswith(("text_encoder2.", "image_encoder.",
                                          "vocos."))]
        if core_left:
            print(f"WARNING: {len(core_left)} unconsumed core keys, e.g. "
                  f"{core_left[:5]}")
        save_model(os.path.join(args.out, "cfm"), cfm)
        print("converted cfm core")

    print(f"done -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

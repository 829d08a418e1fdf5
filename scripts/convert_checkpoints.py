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
    ap.add_argument("--out", required=True)
    ap.add_argument("--notes", type=int, default=51,
                    help="51 (shipped) or 88 (full-keyboard variant)")
    args = ap.parse_args()

    from v2ap_tpu.utils.jitting import enable_compile_cache, create_model
    enable_compile_cache()
    from flax import nnx
    from v2ap_tpu import config as cfglib
    from v2ap_tpu.utils.checkpoint import save_model

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

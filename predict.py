#!/usr/bin/env python
"""Cog-style Predictor API (reference: predict.py:316-375).

    from predict import Predictor
    p = Predictor()
    p.setup()                              # builds the model stack
    out = p.predict(video="clip.mp4", prompt="rain", v2a_num_steps=25,
                    if_piano=False)        # -> path to generated media
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional


class Predictor:
    def __init__(self, cfg=None, tiny: bool = False):
        self._cfg = cfg
        self._tiny = tiny
        self.pipeline = None

    def setup(self, ckpt: Optional[str] = None) -> None:
        from v2ap_tpu.utils.jitting import enable_compile_cache, \
            force_cpu_if_requested
        force_cpu_if_requested()
        enable_compile_cache()
        from v2ap_tpu.config import V2APConfig
        from v2ap_tpu.pipelines.generate import V2APipeline

        if self._tiny:
            import dataclasses
            from v2ap_tpu import config as cfglib
            from v2ap_tpu.models.t5 import t5_tiny_test
            from v2ap_tpu.models.clip_vit import clip_tiny_test
            cfg = cfglib.tiny_test()
            cfg = cfg.replace(model=dataclasses.replace(
                cfg.model, dim_text=16, dim_context=32, num_channels=8))
            self.pipeline = V2APipeline(cfg, t5_config=t5_tiny_test(),
                                        clip_config=clip_tiny_test())
        else:
            self.pipeline = V2APipeline(self._cfg or V2APConfig())
        if ckpt:
            self.pipeline.load_weights(ckpt)

    def predict(self, video: str, prompt: str = "",
                v2a_num_steps: int = 25, if_piano: bool = False,
                out_dir: Optional[str] = None, seed: int = 0,
                fewstep: Optional[int] = None) -> str:
        """``fewstep=N`` serves with a reflow-distilled student (N uniform
        Euler steps, no CFG — pass the student checkpoint to ``setup``);
        see v2ap_tpu/training/distill.py."""
        assert self.pipeline is not None, "call setup() first"
        out_dir = out_dir or tempfile.mkdtemp(prefix="v2ap_")
        os.makedirs(out_dir, exist_ok=True)
        stem = os.path.splitext(os.path.basename(video))[0]
        out_path = os.path.join(out_dir, f"{stem}.generated.mp4")
        from v2ap_tpu.data.video_io import mux_audio_onto_video
        wav, sr = self.pipeline.generate(
            video, prompt, steps=v2a_num_steps, piano=if_piano, seed=seed,
            fewstep=fewstep)
        muxed = mux_audio_onto_video(video, wav, sr, out_path)
        # without a muxer the wav sits next to the target path
        return out_path if muxed else os.path.splitext(out_path)[0] + ".wav"


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--prompt", default="")
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--piano", action="store_true")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--fewstep", type=int, default=None,
                    help="reflow-distilled serving: N uniform steps, no CFG "
                         "(pass the distilled student via --ckpt)")
    args = ap.parse_args()
    p = Predictor(tiny=args.tiny)
    p.setup(args.ckpt)
    print(p.predict(args.video, args.prompt, args.steps, args.piano,
                    fewstep=args.fewstep))

"""Per-frame video-encoder registry: every ``video_encoder`` mode of the
reference (e2_tts_crossatt3.py:1421-1465), including the 4-tower "mixed"
4608-d concat path.

| mode          | tower(s)                              | embed dim |
|---------------|---------------------------------------|-----------|
| clip_vit      | CLIP ViT-bigG (IP-Adapter SDXL)       | 1280      |
| clip_vit2     | CLIP ViT-L/14-336                     | 768       |
| clip_convnext | open_clip ConvNeXt-XXLarge            | 1024      |
| dinov2        | DINOv2-giant (pooler_output)          | 1536      |
| mixed         | concat of all four -> CFM ``proj_text``| 4608     |

Each tower carries its own preprocessing (image size + normalisation
constants matching the processors the reference loads: CLIPImageProcessor,
open_clip transforms, AutoImageProcessor for dinov2).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np
from flax import nnx

from v2ap_tpu.models.clip_vit import (
    CLIP_MEAN, CLIP_STD, CLIPVisionModel, clip_vit_bigg, clip_vit_l_336,
    preprocess_frames,
)
from v2ap_tpu.models.convnext import ConvNextCLIP, convnext_xxlarge
from v2ap_tpu.models.dinov2 import (
    IMAGENET_MEAN, IMAGENET_STD, Dinov2Model, dinov2_giant,
)


@dataclasses.dataclass
class VideoTower:
    name: str                 # cache-dir suffix (mirrors the reference's
    model: nnx.Module         #  feature/ feature_clip_vit2/ ... layout)
    preprocess: Callable[[np.ndarray], np.ndarray]   # geometry only -> uint8
    embed_dim: int
    mean: tuple               # normalisation applied device-side
    std: tuple


VALID_ENCODERS = ("clip_vit", "clip_vit2", "clip_convnext", "dinov2", "mixed")


def mixed_embed_dim(overrides: Optional[dict] = None) -> int:
    towers = _tower_specs(overrides)
    return sum(spec[2] for spec in towers.values())


def _tower_specs(overrides: Optional[dict] = None) -> dict:
    """name -> (config, builder, embed_dim, preprocess kwargs)."""
    o = overrides or {}

    def spec(name, default_cfg, builder, mean, std, dim_attr):
        cfg = o.get(name, default_cfg())
        return (cfg, builder, getattr(cfg, dim_attr),
                dict(image_size=cfg.image_size, mean=mean, std=std))

    return {
        "clip_vit": spec("clip_vit", clip_vit_bigg, CLIPVisionModel,
                         CLIP_MEAN, CLIP_STD, "projection_dim"),
        "clip_vit2": spec("clip_vit2", clip_vit_l_336, CLIPVisionModel,
                          CLIP_MEAN, CLIP_STD, "projection_dim"),
        "clip_convnext": spec("clip_convnext", convnext_xxlarge, ConvNextCLIP,
                              CLIP_MEAN, CLIP_STD, "embed_dim"),
        "dinov2": spec("dinov2", dinov2_giant, Dinov2Model,
                       IMAGENET_MEAN, IMAGENET_STD, "hidden_size"),
    }


def build_video_towers(video_encoder: str, *, seed: int = 0,
                       overrides: Optional[dict] = None) -> List[VideoTower]:
    """Construct the tower list for a ``ConditioningConfig.video_encoder``
    value. ``overrides`` maps tower name -> config (tiny test configs)."""
    from v2ap_tpu.utils.jitting import create_model

    if video_encoder not in VALID_ENCODERS:
        raise ValueError(f"video_encoder {video_encoder!r} not one of "
                         f"{VALID_ENCODERS}")
    specs = _tower_specs(overrides)
    names = (list(specs) if video_encoder == "mixed" else [video_encoder])
    towers = []
    for i, name in enumerate(names):
        cfg, builder, dim, pre_kw = specs[name]
        model = create_model(
            lambda b=builder, c=cfg, s=seed + i: b(c, rngs=nnx.Rngs(s)))
        towers.append(VideoTower(
            name=name, model=model,
            preprocess=lambda frames, kw=pre_kw: preprocess_frames(
                frames, kw["image_size"], normalize=False),
            embed_dim=dim, mean=tuple(pre_kw["mean"]),
            std=tuple(pre_kw["std"])))
    return towers

"""Keyboard crop-box registry (reference: src/audeo/piano_coords.py — a
hardcoded dict of per-video keyboard regions for the Audeo YouTube set).

Here the registry is data-driven: boxes load from a JSON file or register
programmatically, and ``crop_keyboard`` applies one to decoded frames before
the 900x100 grayscale preprocessing.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

import numpy as np

Box = Tuple[int, int, int, int]            # (top, bottom, left, right)

_REGISTRY: Dict[str, Box] = {}


def register(video_id: str, box: Box) -> None:
    _REGISTRY[video_id] = tuple(int(v) for v in box)


def get(video_id: str) -> Optional[Box]:
    return _REGISTRY.get(video_id)


def load_registry(path: str) -> int:
    with open(path) as f:
        data = json.load(f)
    for vid, box in data.items():
        register(vid, box)
    return len(data)


def save_registry(path: str) -> None:
    with open(path, "w") as f:
        json.dump({k: list(v) for k, v in _REGISTRY.items()}, f, indent=2)


def crop_keyboard(frames: np.ndarray, box: Box) -> np.ndarray:
    """frames (t, H, W, ...) -> cropped to the keyboard region."""
    top, bottom, left, right = box
    return frames[:, top:bottom, left:right]

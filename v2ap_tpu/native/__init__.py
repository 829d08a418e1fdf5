"""ctypes bindings for the native host-pipeline library (v2ap_native.cpp).

The library builds on demand (g++, ~1 s) and every entry point has a numpy
fallback in the pure-python data modules, so the framework degrades
gracefully on hosts without a toolchain. Use :func:`available` to check and
:func:`lib` to access the loaded CDLL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libv2ap_native.so")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> bool:
    src = os.path.join(_DIR, "v2ap_native.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_DIR, "v2ap_native.cpp")
    stale = (os.path.exists(_SO) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_SO))
    if (not os.path.exists(_SO) or stale) and not _build() \
            and not os.path.exists(_SO):
        return None
    try:
        L = ctypes.CDLL(_SO)
    except OSError:
        return None
    c_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    c_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    L.wav_decode.restype = ctypes.c_int
    L.wav_decode.argtypes = [
        c_u8p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_void_p, ctypes.c_int64]
    L.resample_poly.restype = ctypes.c_int64
    L.resample_poly.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int32,
                                ctypes.c_int32, ctypes.c_int32, c_f32p,
                                ctypes.c_int64]
    L.frame_energy.restype = None
    L.frame_energy.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int32, c_f32p]
    L.max_energy_start.restype = ctypes.c_int64
    L.max_energy_start.argtypes = [c_f32p, ctypes.c_int64, ctypes.c_int32,
                                   ctypes.c_int64]
    L.gray_resize.restype = None
    L.gray_resize.argtypes = [c_u8p, ctypes.c_int32, ctypes.c_int32,
                              ctypes.c_int32, ctypes.c_int32, c_f32p]
    if hasattr(L, "clip_preprocess_batch"):   # absent in pre-r3 builds
        L.clip_preprocess_batch.restype = None
        L.clip_preprocess_batch.argtypes = [
            c_u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, c_u8p]
    if hasattr(L, "pack_yuv420"):             # absent in pre-r3s4 builds
        L.pack_yuv420.restype = None
        L.pack_yuv420.argtypes = [c_u8p, ctypes.c_int32, ctypes.c_int32,
                                  c_u8p, c_u8p]
    _LIB = L
    return _LIB


def available() -> bool:
    return lib() is not None


# ---------------------------------------------------------------- wrappers

def wav_decode(data: bytes):
    """bytes -> (float32 (ch, n), sample_rate) or None if unsupported."""
    L = lib()
    if L is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = L.wav_decode(buf, len(buf), ctypes.byref(sr), ctypes.byref(ch),
                      ctypes.byref(frames), None, 0)
    if rc != 0:
        return None
    out = np.empty(frames.value * ch.value, np.float32)
    rc = L.wav_decode(buf, len(buf), ctypes.byref(sr), ctypes.byref(ch),
                      ctypes.byref(frames),
                      out.ctypes.data_as(ctypes.c_void_p), out.size)
    if rc != 0:
        return None
    return out.reshape(frames.value, ch.value).T.copy(), int(sr.value)


def resample_poly(x: np.ndarray, up: int, down: int,
                  half_taps: int = 32) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    out_len = (len(x) * up + down - 1) // down
    out = np.empty(out_len, np.float32)
    n = L.resample_poly(x, len(x), up, down, half_taps, out, out_len)
    if n < 0:
        return None
    return out[:n]


def max_energy_start(x: np.ndarray, hop: int, target_frames: int) -> Optional[int]:
    L = lib()
    if L is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    total = len(x) // hop
    return int(L.max_energy_start(x, total, hop, target_frames))


def gray_resize(rgb: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    L = lib()
    if L is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, _ = rgb.shape
    out = np.empty((out_h, out_w), np.float32)
    L.gray_resize(rgb, h, w, out_h, out_w, out)
    return out


def pack_yuv420(px: np.ndarray):
    """uint8 RGB (t, s, s, 3), s even -> (y (t,s,s), uv (t,2,s/2,s/2)) uint8
    (full-range BT.601, chroma 2x2 box-averaged). None -> numpy fallback."""
    L = lib()
    if L is None or not hasattr(L, "pack_yuv420"):
        return None
    px = np.ascontiguousarray(px, np.uint8)
    t, s, s2, c = px.shape
    if c != 3 or s != s2 or s % 2:
        return None
    y = np.empty((t, s, s), np.uint8)
    uv = np.empty((t, 2, s // 2, s // 2), np.uint8)
    L.pack_yuv420(px, t, s, y, uv)
    return y, uv


def clip_preprocess_batch(frames: np.ndarray, size: int
                          ) -> Optional[np.ndarray]:
    """uint8 RGB (t, h, w, 3) -> PIL-exact short-edge bicubic resize +
    center crop, uint8 (t, size, size, 3). None when the native lib is
    unavailable or lacks the symbol (callers fall back to PIL)."""
    L = lib()
    if L is None or not hasattr(L, "clip_preprocess_batch"):
        return None
    frames = np.ascontiguousarray(frames, np.uint8)
    t, h, w, c = frames.shape
    if c != 3 or min(h, w) < 1:
        return None
    out = np.empty((t, size, size, 3), np.uint8)
    L.clip_preprocess_batch(frames, t, h, w, size, out)
    return out

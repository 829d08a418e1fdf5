"""Native C++ host-pipeline library: build, decode, resample, segment, resize
— validated against the pure-python/scipy implementations."""

import numpy as np
import pytest

from v2ap_tpu import native
from v2ap_tpu.data.audio_io import (
    HOP_SIZE, read_wav, resample, select_max_energy_segment, write_wav,
)

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_wav_decode_matches_python(tmp_path):
    sr = 24_000
    t = np.arange(sr) / sr
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    path = str(tmp_path / "x.wav")
    write_wav(path, wav, sr)
    with open(path, "rb") as f:
        data = f.read()
    out = native.wav_decode(data)
    assert out is not None
    audio, got_sr = out
    assert got_sr == sr
    ref, _ = read_wav(path)
    np.testing.assert_allclose(audio, ref, atol=1e-6)


def test_resample_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=4800).astype(np.float32)
    out = native.resample_poly(x, 1, 2)
    assert out is not None
    assert len(out) == 2400
    ref = resample(x[None], 48_000, 24_000)[0]
    # different windows/taps: compare against the bandlimited reference
    # loosely in the interior
    err = np.abs(out[100:-100] - ref[100:-100])
    assert err.mean() < 0.05


def test_resample_identity():
    x = np.arange(100, dtype=np.float32)
    out = native.resample_poly(x, 1, 1)
    np.testing.assert_array_equal(out, x)


def test_max_energy_start_matches_python():
    rng = np.random.default_rng(0)
    x = (rng.normal(size=100 * HOP_SIZE) * 0.01).astype(np.float32)
    x[40 * HOP_SIZE: 55 * HOP_SIZE] += 0.8
    start = native.max_energy_start(x, HOP_SIZE, 10)
    seg = select_max_energy_segment(x[None], 10)
    ref_start = None
    for s in range(91):
        if np.array_equal(x[s * HOP_SIZE:(s + 10) * HOP_SIZE], seg[0]):
            ref_start = s
            break
    assert start == ref_start


def test_gray_resize_shape_and_range():
    rng = np.random.default_rng(0)
    rgb = (rng.random((50, 200, 3)) * 255).astype(np.uint8)
    out = native.gray_resize(rgb, 100, 900)
    assert out.shape == (100, 900)
    assert 0.0 <= out.min() and out.max() <= 1.0
    # constant image stays constant
    flat = np.full((20, 30, 3), 128, np.uint8)
    out2 = native.gray_resize(flat, 10, 15)
    np.testing.assert_allclose(out2, 128 / 255.0, atol=1e-3)


def _pil_clip_geometry(frames: np.ndarray, size: int) -> np.ndarray:
    """The original PIL per-frame loop (clip_vit.preprocess_frames geometry
    path) — the oracle the native batch kernel must match bit-for-bit."""
    from PIL import Image

    out = np.empty((len(frames), size, size, 3), np.uint8)
    for i in range(len(frames)):
        img = Image.fromarray(frames[i])
        w, h = img.size
        short = min(w, h)
        nw, nh = round(w * size / short), round(h * size / short)
        img = img.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - size) // 2, (nh - size) // 2
        out[i] = np.asarray(
            img.crop((left, top, left + size, top + size)), np.uint8)
    return out


@pytest.mark.parametrize("shape,size", [
    ((3, 360, 640, 3), 224),   # serving: downscale landscape
    ((2, 640, 360, 3), 224),   # portrait
    ((2, 100, 160, 3), 224),   # upscale
    ((1, 224, 224, 3), 224),   # identity-size
    ((2, 123, 457, 3), 96),    # odd sizes
])
def test_clip_preprocess_batch_matches_pil(shape, size):
    rng = np.random.default_rng(0)
    frames = (rng.random(shape) * 255).astype(np.uint8)
    out = native.clip_preprocess_batch(frames, size)
    assert out is not None
    ref = _pil_clip_geometry(frames, size)
    delta = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    # PIL's fixed-point resample is replicated exactly; allow 1 uint8 level
    # for platform rounding differences in the double->int coefficient cast
    assert delta.max() <= 1, f"max|d|={delta.max()}"
    assert (delta > 0).mean() < 0.01


def test_pack_yuv420_matches_numpy():
    """Native fixed-point RGB->YUV420 matches the numpy float reference in
    models/clip_vit.py to 1 LSB (rational coefficient rounding only)."""
    from v2ap_tpu.models import clip_vit

    rng = np.random.default_rng(1)
    px = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)
    got = native.pack_yuv420(px)
    assert got is not None, "native pack_yuv420 unavailable"
    y_n, uv_n = got

    # numpy reference path (bypass the native fast path)
    f = px.astype(np.float32)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 + (b - y) / 1.772
    cr = 128.0 + (r - y) / 1.402
    t, s, _ = y.shape
    h = s // 2
    sub = lambda c: c.reshape(t, h, 2, h, 2).mean(axis=(2, 4))
    y_ref = np.clip(y + 0.5, 0, 255).astype(np.uint8)
    uv_ref = np.clip(np.stack([sub(cb), sub(cr)], 1) + 0.5,
                     0, 255).astype(np.uint8)
    assert np.abs(y_n.astype(int) - y_ref.astype(int)).max() <= 1
    assert np.abs(uv_n.astype(int) - uv_ref.astype(int)).max() <= 1

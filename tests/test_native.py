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

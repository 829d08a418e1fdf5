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

"""Audeo piano subsystem: Video2Roll perception (models/video2roll), the
Roll2Midi cleanup GAN, datasets, training loops, evaluation metrics, and
dependency-free MIDI synthesis (reference: src/audeo/, SURVEY §2.4)."""

from v2ap_tpu.audeo.roll2midi import (  # noqa: F401
    AttentionGate, Roll2MidiDiscriminator, Roll2MidiGenerator,
)
from v2ap_tpu.audeo.synth import (  # noqa: F401
    MidiSynth, roll_to_notes, synthesize_notes, write_midi_file,
)
from v2ap_tpu.audeo.evaluate import RollMetrics, evaluate_rolls, evaluate_per_key  # noqa: F401
from v2ap_tpu.audeo.datasets import (  # noqa: F401
    Roll2MidiPairs, Video2RollSamples, load_roll_chunk_dir,
    video2roll_infer_chunks,
)
from v2ap_tpu.audeo.train import (  # noqa: F401
    Roll2MidiTrainer, Video2RollTrainer,
)

"""De-circularized checkpoint-key audit (VERDICT r2 next #5).

``tests/golden/reference_keys_<variant>.json`` are derived by EXECUTING the
reference's own ``Transformer``/``Video2RollNet`` constructors at the shipped
full-size hyperparameters (scripts/derive_reference_keys.py), so the
ModuleList nesting, conditional module indices and per-stream structure come
from the reference source — not from the same hand that wrote the converter.
These tests pin the converter's expectations (``reference_manifest``) and its
piano-net loader against that executed inventory, key by key and shape by
shape. The one residual unknown stays the x_transformers leaf naming
(PARITY.md); both historical spellings are accepted by the converter.
"""

import dataclasses
import json
import os

import numpy as np
import pytest
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.utils.reference_manifest import ALL_VARIANTS, reference_manifest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _derived(variant):
    path = os.path.join(GOLDEN, f"reference_keys_{variant}.json")
    with open(path) as f:
        return {k: tuple(v) for k, v in json.load(f).items()}


def _fullsize_mc(variant):
    mc = cfglib.v2a_default().model
    if variant == "crossatt3_2":
        mc = dataclasses.replace(mc, notes=88, note_min=0, note_max=87)
    return mc


@pytest.mark.parametrize("variant", ALL_VARIANTS)
def test_manifest_matches_executed_reference(variant):
    """The hand-written manifest must equal the executed-constructor
    inventory exactly — names AND shapes — at full size."""
    derived = {k: v for k, v in _derived(variant).items()
               if not k.startswith("video2roll_net.")}
    manifest = {k: tuple(s) for k, s in
                reference_manifest(_fullsize_mc(variant), variant).items()}
    assert sorted(manifest) == sorted(derived)
    mismatched = {k: (manifest[k], derived[k]) for k in manifest
                  if manifest[k] != derived[k]}
    assert mismatched == {}


@pytest.mark.parametrize("variant", ("crossatt3", "crossatt3_2"))
def test_video2roll_loader_consumes_executed_inventory(variant):
    """The flat-key Video2RollNet loader must consume every key the real
    reference net (imported from src/audeo, state_dict dumped) produces —
    no missing keys, no unconsumed leftovers, at 51 and 88 notes."""
    from v2ap_tpu.models.video2roll import Video2RollNet
    from v2ap_tpu.utils.jitting import create_model_zeros
    from v2ap_tpu.utils.reference_ckpt import _SD, _load_video2roll_flat

    keys = {k: v for k, v in _derived(variant).items()
            if k.startswith("video2roll_net.")}
    assert keys, "derived inventory has no video2roll keys"
    notes = _fullsize_mc(variant).notes
    assert keys["video2roll_net.fc.weight"] == (notes, 128)
    jnet = create_model_zeros(
        lambda: Video2RollNet(num_classes=notes, rngs=nnx.Rngs(0)))
    sd = _SD({k: np.zeros(v, np.float32) for k, v in keys.items()})
    _load_video2roll_flat(sd, "video2roll_net", jnet)
    # BN running stats ride along in torch state dicts; everything that is a
    # parameter or a tracked statistic must be consumed
    leftover = [k for k in sd.unused() if not k.endswith("num_batches_tracked")]
    assert leftover == []


def test_derived_inventories_are_fresh():
    """Re-derivation must be possible (reference present) or the goldens must
    exist — guards against silently testing nothing."""
    for variant in ALL_VARIANTS:
        assert os.path.exists(
            os.path.join(GOLDEN, f"reference_keys_{variant}.json"))

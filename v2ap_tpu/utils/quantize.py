"""Serving-time int8 quantization for frozen encoder towers.

The hot serving cost outside the CFM loop is the vision towers (CLIP
ViT-bigG dominates); their matmuls can run int8 on the MXU (~2x the bf16
rate on v5e) with dynamic-range quantization (AQT AbsMax, per-channel /
per-token scales shared over the contraction axes only). This swaps every
``nnx.Linear``'s ``dot_general`` for an AQT int8 one in place — weights stay
stored in bf16/f32 and quantise inside the op, so checkpoints and the rest
of the stack are untouched.

int8 towers are the SERVING DEFAULT (``V2AP_INT8_TOWERS=0`` or
``V2APipeline(..., quantize_towers=False)`` restores bf16 reference-parity
mode). Quality bound measured by ``scripts/probe_tower_drift.py`` on bigG:
conditioning features drift 2.95% rel-rms vs the f32 tower — about 2x the
1.39% drift the bf16 compute dtype (the previous, uncontested default)
already incurs; mlp-only (2.15%) and skip-last-4-layers (2.84%) variants buy
no qualitative improvement. Training, eval and parity tests never quantize.
The CFM core itself stays bf16 unless ``V2AP_INT8_CFM=1``: by the same probe
methodology (``scripts/probe_cfm_drift.py``, 4-step full-size sampling),
bf16 drifts sampled latents 1.28% rel-rms vs f32 while int8 drifts 3.52%
(2.7x) — and unlike the frozen towers the CFM is the trained generative core
whose output IS the audio, so the default stays conservative.
"""

from __future__ import annotations

from flax import nnx


def make_int8_dot_general():
    """lax.dot_general-compatible callable running int8 x int8 -> int32 on
    the MXU with AQT dynamic-range quantization."""
    from aqt.jax.v2 import config as aqt_config

    dg = aqt_config.dot_general_make(lhs_bits=8, rhs_bits=8)

    def int8_dot_general(lhs, rhs, dimension_numbers, precision=None,
                         preferred_element_type=None, **unused_kwargs):
        # flax may pass extra lax.dot_general kwargs (e.g. out_sharding);
        # AQT's DotGeneral only takes (lhs, rhs, dims, precision)
        return dg(lhs, rhs, dimension_numbers, precision)

    return int8_dot_general


def quantize_linears_int8(model: nnx.Module) -> int:
    """Swap every ``nnx.Linear`` in ``model`` to the int8 dot_general in
    place. Returns the number of layers converted."""
    dot_general = make_int8_dot_general()
    count = 0
    for _, node in nnx.iter_graph(model):
        if isinstance(node, nnx.Linear):
            node.dot_general = dot_general
            count += 1
    return count

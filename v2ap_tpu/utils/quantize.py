"""Serving-time int8 quantization for frozen encoder towers.

The hot serving cost outside the CFM loop is the vision towers (CLIP
ViT-bigG dominates); their matmuls can run int8 on the MXU (~2x the bf16
rate on v5e) with dynamic-range quantization. This swaps every
``nnx.Linear``'s ``dot_general`` for an AQT int8 one in place — weights stay
stored in bf16/f32 and quantise inside the op, so checkpoints and the rest
of the stack are untouched. Opt-in (``V2APipeline(..., quantize_towers=True)``
or env ``V2AP_INT8_TOWERS=1``): conditioning features shift slightly
(int8 DRQ), the CFM core itself is never quantised.
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

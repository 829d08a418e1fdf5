"""Masked depthwise 1-D convolution (the voicebox-style positional module).

Math parity with reference e2_tts_crossatt3.py:495-528: zero masked positions,
depthwise conv (kernel 31, 'same' padding), SiLU, re-mask. Expressed as a
grouped `lax.conv_general_dilated` in NWC layout, which XLA lowers to an
MXU-friendly depthwise conv on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from flax import nnx


class DepthwiseConv1d(nnx.Module):
    def __init__(self, dim: int, kernel_size: int, *,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        assert kernel_size % 2 == 1, "kernel must be odd for 'same' padding"
        self.dim = dim
        self.kernel_size = kernel_size
        self.dtype = dtype
        # torch Conv1d default init: U(-1/sqrt(k), 1/sqrt(k)) with fan_in = k (depthwise)
        init = nnx.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
        # kernel layout (width, in_features/group=1, out_features=dim)
        self.kernel = nnx.Param(init(rngs.params(), (kernel_size, 1, dim), jnp.float32))
        self.bias = nnx.Param(jnp.zeros((dim,), jnp.float32))

    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        # x: (b, n, d); mask: (b, n) True == keep
        orig_dtype = x.dtype
        if mask is not None:
            x = jnp.where(mask[..., None], x, 0.0)
        out = lax.conv_general_dilated(
            x.astype(self.dtype),
            self.kernel[...].astype(self.dtype),
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.dim,
        )
        out = out + self.bias[...].astype(self.dtype)
        out = nnx.silu(out)
        if mask is not None:
            out = jnp.where(mask[..., None], out, 0.0)
        return out.astype(orig_dtype)

"""GLU feedforward block (x_transformers ``FeedForward(glu=True)`` math).

proj(x) -> (v, gate); v * gelu(gate) -> dropout -> out-proj. The two matmuls
are the FLOPs-dominant part and run in the compute dtype (bf16 on TPU) so XLA
tiles them onto the MXU; the gate elementwise fuses into the first matmul.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import nnx


class GLUFeedForward(nnx.Module):
    def __init__(self, dim: int, mult: int = 4, dropout: float = 0.0, *,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        inner = int(dim * mult)
        self.proj_in = nnx.Linear(dim, inner * 2, dtype=dtype,
                                  param_dtype=jnp.float32, rngs=rngs)
        self.proj_out = nnx.Linear(inner, dim, dtype=dtype,
                                   param_dtype=jnp.float32, rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs)

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        v, gate = jnp.split(self.proj_in(x), 2, axis=-1)
        # exact (erf) gelu: torch nn.GELU's default, which the reference's
        # x_transformers FeedForward uses; the tanh approximation drifts
        # ~1e-3 and would break checkpoint parity. Elementwise — XLA fuses it
        # into the first matmul either way.
        h = v * nnx.gelu(gate, approximate=False)
        h = self.dropout(h, deterministic=deterministic)
        return self.proj_out(h)

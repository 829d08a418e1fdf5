"""Random-Fourier time embedding + time-conditioning MLP.

Math parity with reference e2_tts_crossatt3.py:555-564,790-797:
  fourier(x) = concat([x, sin(2π·x·w), cos(2π·x·w)])  with fixed gaussian w,
  time_mlp   = SiLU(Linear(dim+1 -> dim)(fourier(t))).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


class RandomFourierEmbed(nnx.Module):
    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        assert dim % 2 == 0
        # fixed (non-trainable) gaussian projection, like a registered buffer
        key = rngs.params()
        self.weights = nnx.Variable(jax.random.normal(key, (dim // 2,), jnp.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (b,) times in [0, 1]
        x = x.astype(jnp.float32)
        freqs = x[:, None] * self.weights[...][None, :] * 2.0 * jnp.pi
        return jnp.concatenate([x[:, None], jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


class TimeCondMLP(nnx.Module):
    """times (b,) -> conditioning vector (b, dim)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        self.fourier = RandomFourierEmbed(dim, rngs=rngs)
        self.proj = nnx.Linear(dim + 1, dim, param_dtype=jnp.float32,
                               dtype=jnp.float32, rngs=rngs)

    def __call__(self, times: jnp.ndarray) -> jnp.ndarray:
        return nnx.silu(self.proj(self.fourier(times)))

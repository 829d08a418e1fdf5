"""ODE sampling utilities: sway timestep schedule, Euler integration as a
single `lax.scan`, and the CFG parallel-component projection.

The reference integrates with torchdiffeq's python-loop Euler over a sway-
warped grid (e2_tts_crossatt3.py:2250-2255). Here the schedule is precomputed
on host and the whole trajectory is one jitted `lax.scan`, so all `steps`
model evaluations compile into a single XLA while-loop with no host round
trips.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def sway_timesteps(steps: int, sway: bool = True) -> np.ndarray:
    """t in [0,1]; sway warp t <- t - (cos(pi/2 t) - 1 + t) == 1 - cos(pi/2 t).

    Front-loads resolution near t=0 where the flow field changes fastest
    (reference e2_tts_crossatt3.py:2251-2252).
    """
    t = np.linspace(0.0, 1.0, steps, dtype=np.float64)
    if sway:
        t = t + -1.0 * (np.cos(np.pi / 2.0 * t) - 1.0 + t)
    return t.astype(np.float32)


def euler_integrate(
    fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    method: str = "euler",
) -> jnp.ndarray:
    """Fixed-grid ODE integration as one `lax.scan`, returning y(T).

    methods: 'euler' (1 fn eval/step — the reference's shipped solver),
    'midpoint' (2 evals/step — the solver its odeint config comments out),
    'heun' (2 evals/step, trapezoidal). `ts` has shape (steps,); the scan
    runs (steps-1) * evals_per_step model evaluations.
    """
    dts = ts[1:] - ts[:-1]

    if method == "euler":
        def step(y, t_dt):
            t, dt = t_dt
            return y + dt * fn(t, y), None
    elif method == "midpoint":
        def step(y, t_dt):
            t, dt = t_dt
            k1 = fn(t, y)
            k2 = fn(t + dt / 2, y + dt / 2 * k1)
            return y + dt * k2, None
    elif method == "heun":
        def step(y, t_dt):
            t, dt = t_dt
            k1 = fn(t, y)
            k2 = fn(t + dt, y + dt * k1)
            return y + dt / 2 * (k1 + k2), None
    else:
        raise ValueError(f"unknown ODE method '{method}'")

    yT, _ = jax.lax.scan(step, y0, (ts[:-1], dts))
    return yT


def project_parallel(x: jnp.ndarray, y: jnp.ndarray):
    """Split x into components parallel/orthogonal to y over all-but-batch dims
    (reference e2_tts_crossatt3.py:162-173; arXiv 2410.02416 CFG fix)."""
    b = x.shape[0]
    xf = x.reshape(b, -1).astype(jnp.float32)
    yf = y.reshape(b, -1).astype(jnp.float32)
    unit = yf / jnp.sqrt(jnp.maximum(
        jnp.sum(yf * yf, axis=-1, keepdims=True), 1e-24))
    parallel = jnp.sum(xf * unit, axis=-1, keepdims=True) * unit
    orthogonal = xf - parallel
    return (parallel.reshape(x.shape).astype(x.dtype),
            orthogonal.reshape(x.shape).astype(x.dtype))


def lens_to_mask(lens: jnp.ndarray, length: int) -> jnp.ndarray:
    """(b,) lengths -> (b, length) bool mask."""
    seq = jnp.arange(length)
    return seq[None, :] < lens[:, None]


def mask_from_frac_lengths(
    lens: jnp.ndarray,           # (b,)
    frac_lengths: jnp.ndarray,   # (b,)
    length: int,
    rand: jnp.ndarray,           # (b,) uniform [0,1) start-position draw
) -> jnp.ndarray:
    """Random contiguous span mask per row (reference e2_tts_crossatt3.py:316-337)."""
    span = (frac_lengths * lens).astype(jnp.int32)
    max_start = lens - span
    start = jnp.clip((max_start * rand).astype(jnp.int32), 0, None)
    end = start + span
    seq = jnp.arange(length)
    return (seq[None, :] >= start[:, None]) & (seq[None, :] < end[:, None])

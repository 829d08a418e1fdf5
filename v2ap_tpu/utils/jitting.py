"""JIT/compile-cache utilities.

On this stack every *eager* primitive dispatch triggers a mini-compilation
(~0.1-1 s each), so models must be constructed and invoked under jit:
``create_model`` traces the whole parameter initialisation into one XLA
program, and ``enable_compile_cache`` turns on JAX's persistent on-disk
compilation cache so both test (CPU) and TPU executables survive across
processes (second runs compile in milliseconds).
"""

from __future__ import annotations

import hashlib
import os
import platform
from typing import Callable, TypeVar

import jax
from flax import nnx

M = TypeVar("M", bound=nnx.Module)

_DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def machine_fingerprint() -> str:
    """Short stable id for this host's CPU capabilities.

    XLA:CPU persistent-cache entries are AOT executables specialised to the
    compiling machine's feature set; loading them on a different host can
    SIGILL/hang (observed as the round-1 multichip-dryrun rc=124: the driver
    host loaded entries compiled elsewhere). Keying the cache dir by a CPU
    fingerprint makes a foreign host start cold instead of loading poison.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                flags = ""
    except OSError:
        flags = ""
    h = hashlib.sha256((platform.machine() + flags).encode()).hexdigest()[:12]
    return h


def force_cpu_if_requested() -> bool:
    """V2AP_PROBE_CPU=1 pins jax to the CPU backend. Needed because the
    axon sitecustomize force-selects the tunneled TPU platform and IGNORES
    the JAX_PLATFORMS env var — only a post-import config.update sticks.
    Call first thing in script entry points so probes/CI can run them
    off-TPU. Returns True when CPU was forced."""
    import os
    if os.environ.get("V2AP_PROBE_CPU") == "1":
        import jax
        jax.config.update("jax_platforms", "cpu")
        return True
    return False


def enable_compile_cache(path: str | None = None) -> None:
    """Persistent on-disk compile cache, keyed per machine (see
    ``machine_fingerprint``). Only worthwhile entries are cached (tiny
    dispatch-level programs recompile in ms and would bloat the dir)."""
    base = path or _DEFAULT_CACHE
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(base, machine_fingerprint()))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def create_model(factory: Callable[[], M]) -> M:
    """Build an nnx model with all param initialisation fused into one jitted
    program (vastly faster than eager per-param init)."""
    return nnx.jit(factory)()


def model_rngs(seed: int):
    """``nnx.Rngs`` whose dropout stream optionally rides the TPU hardware RNG.

    Threefry (JAX's default PRNG) spends ~10 vector ops per random word; the
    b24 full-remat train-step profile attributes ~70 ms/step to dropout mask
    generation + select (and remat recomputes the masks in the backward).
    The default (``V2AP_RBG_DROPOUT=1``) puts ONLY the dropout stream on the
    ``rbg`` implementation, which lowers to XLA's stateless
    ``RngBitGenerator`` (the hardware generator on TPU): the Bernoulli
    keep-probability is identical and the stream is still deterministic per
    (seed, fold-in count) — just a *different* deterministic stream than
    threefry's, so set ``V2AP_RBG_DROPOUT=0`` to pin threefry masks.
    Measured (b24 x 736 full-remat train step, one v5e chip, 2026-08-20):
    1388.1 -> 1272.8 ms/step (MFU 0.331 -> 0.361). Params/other streams stay
    threefry (a dedicated dropout stream shifts the default stream's fold-in
    counts, so init draws differ from the single-stream build either way;
    converted checkpoints overwrite params, and no golden pins init bits)."""
    if os.environ.get("V2AP_RBG_DROPOUT", "1") == "1":
        return nnx.Rngs(seed, dropout=jax.random.key(seed, impl="rbg"))
    return nnx.Rngs(seed)


def create_model_zeros(factory: Callable[[], M]) -> M:
    """Structure-only construction: the factory traces under
    ``nnx.eval_shape`` (no init compute or compile at all) and params
    materialise as zeros. For converter shape-audits and weight-loading
    flows where every array is overwritten anyway — building CLIP ViT-bigG
    this way takes seconds instead of the ~15 min a full-size jitted random
    init costs on CPU. Do NOT run a model built this way without loading
    real weights."""
    import jax.numpy as jnp
    from jax import dtypes as jax_dtypes

    model = nnx.eval_shape(factory)
    state = nnx.state(model)

    def materialise(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            if jax_dtypes.issubdtype(x.dtype, jax_dtypes.prng_key):
                keys = jax.random.split(jax.random.key(0),
                                        max(1, int(np_prod(x.shape))))
                return keys.reshape(x.shape) if x.shape else keys[0]
            # numpy calloc + device_put: jnp.zeros would eagerly compile a
            # tiny program per distinct shape (minutes across bigG's params)
            import numpy as np
            return jax.device_put(np.zeros(x.shape, x.dtype))
        return x

    nnx.update(model, jax.tree.map(materialise, state))
    return model


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def cast_params(model: nnx.Module, dtype) -> None:
    """Cast every float Param of an nnx model in place (frozen encoder stacks
    are stored bf16 on device: CLIP ViT-bigG alone is ~7 GB in f32)."""
    import jax.numpy as jnp

    state = nnx.state(model, nnx.Param)
    def conv(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    nnx.update(model, jax.tree.map(conv, state))

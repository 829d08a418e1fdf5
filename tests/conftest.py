"""Test harness: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding paths are validated on this virtual mesh (the real TPU in
CI has a single chip); numerical tests run in float32 on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-updates jax_platforms to "axon,cpu" at import,
# which would silently run "CPU" tests on the tunneled TPU chip (with remote
# compiles). Override it back — tests run on an 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
assert jax.local_device_count() == 8, jax.devices()

# default matmul precision trades accuracy for speed (bf16-class passes) even
# with f32 inputs; numerical tests need the real thing.
jax.config.update("jax_default_matmul_precision", "highest")

# every eager primitive dispatch compiles (~0.1-1 s each on this stack); the
# persistent cache makes repeated test runs start warm.
from v2ap_tpu.utils.jitting import enable_compile_cache  # noqa: E402

enable_compile_cache()


# fast health-check subset: `pytest -m smoke` finishes in a few minutes warm
# (the full suite needs ~20+ min cold because of XLA compiles). Module-level
# whitelist rather than per-test marks so new tests in these files stay in.
_SMOKE_MODULES = {
    "test_data", "test_merge", "test_native", "test_audeo", "test_extras",
    "test_serving", "test_fad", "test_ops", "test_reference_ckpt",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)

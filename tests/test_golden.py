"""Golden numerical regression: pin the tiny-config CFM sampling output and
training loss against checked-in values so later refactors (kernel changes,
fusion work) can't silently shift numerics.

Regenerate intentionally with:  V2AP_REGEN_GOLDEN=1 pytest tests/test_golden.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.config import SamplerConfig
from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.utils.jitting import create_model

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "cfm_tiny.npz")


def _compute():
    cfg = cfglib.tiny_test()
    model = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                     with_video2roll=False, rngs=nnx.Rngs(0)))
    rng = np.random.default_rng(123)
    r = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    cond = dict(
        text_embed=r(1, 32, cfg.model.dim_text),
        frames_embed=jnp.zeros((1, 32, cfg.model.notes), jnp.float32),
        context=r(1, 4, cfg.model.dim_context),
        context_mask=jnp.ones((1, 4), bool),
        mask=jnp.ones((1, 32), bool),
    )
    x0 = jax.random.normal(jax.random.key(9), (1, 32, cfg.model.num_channels))
    sample = nnx.jit(
        lambda m, x0, c, s: m.sample(x0, sampler=s, **c),
        static_argnames="s")(model, x0, cond, SamplerConfig(steps=4))
    x1 = r(1, 32, cfg.model.num_channels)
    loss = nnx.jit(
        lambda m, x1, c: m.loss(
            x1, lens=jnp.asarray([32]), text_embed=c["text_embed"],
            context=c["context"], context_mask=c["context_mask"],
            rng=jax.random.key(5), times=0.5, val=True).loss
    )(model, x1, cond)
    return np.asarray(sample), float(loss)


def test_golden_cfm_numerics():
    sample, loss = _compute()
    if os.environ.get("V2AP_REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN):
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, sample=sample, loss=loss)
    data = np.load(GOLDEN)
    # f32 CPU numerics: allow small cross-version drift, catch real changes
    np.testing.assert_allclose(sample, data["sample"], rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(loss, float(data["loss"]), rtol=2e-3)

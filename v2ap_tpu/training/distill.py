"""Few-step sampling via rectified-flow reflow distillation.

The reference serves 25 Euler steps x 2 CFG forwards per clip
(predict.py:363, e2_tts_crossatt3.py:2255) — the sampling FLOPs dominate the
hot loop. Reflow (Liu et al., "Flow Straight and Fast", arXiv 2209.03003;
applied to audio by FlashAudio, arXiv 2410.12266) retrains the SAME
architecture on (noise, sample) pairs drawn from the teacher's own ODE
trajectories: the marginal flow straightens, so 2-4 Euler steps reproduce
what previously took 25 — worth up to ~6x on the serving hot loop at
matched conditioning cost.

TPU-first mechanics: pair generation is the teacher's existing jitted
``lax.scan`` sampler (batched, CFG folded in); distillation reuses the
CFM flow-matching loss with the coupled ``x0`` supplied instead of fresh
gaussian noise (models/cfm.py ``loss(x0=...)``), so the whole student step
stays one jitted program and inherits remat/donation/sharding from the
normal trainer.

Capability status: the machinery is validated end to end on a tiny model in
``tests/test_distill.py`` (teacher trained on a synthetic conditional task;
reflow student at 2 steps beats the teacher at 2 steps and approaches its
8-step quality). Producing a production few-step checkpoint requires the
real released weights (convert first — PARITY.md), then
``scripts/distill_reflow.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from v2ap_tpu.config import SamplerConfig
from v2ap_tpu.models.cfm import CFM


@dataclasses.dataclass(frozen=True)
class ReflowConfig:
    learning_rate: float = 1e-4
    warmup_steps: int = 100
    decay_steps: int = 10_000
    grad_clip: float = 1.0
    teacher_steps: int = 25              # ODE steps when drawing pairs
    cfg_strength: float = 2.0            # guidance baked into the pairs


def make_pair_sampler(teacher: CFM, cfg: ReflowConfig) -> Callable:
    """Returns jitted ``pairs(rng, cond) -> (x0, x1)``: draw gaussian x0 and
    integrate the teacher's ODE under the serving sampler settings. The CFG
    of the teacher is baked into x1, so the student learns the *guided*
    flow and samples WITHOUT CFG (single forward per step — another 2x)."""
    graphdef, state = nnx.split(teacher)
    sampler = SamplerConfig(steps=cfg.teacher_steps,
                            cfg_strength=cfg.cfg_strength,
                            sway_sampling=True)

    @jax.jit
    def pairs(rng, text_embed, frames_embed, context, context_mask, mask):
        m = nnx.merge(graphdef, state)
        b, n, _ = text_embed.shape
        x0 = jax.random.normal(rng, (b, n, m.cfg.num_channels), jnp.float32)
        x1 = m.sample(x0, text_embed=text_embed, frames_embed=frames_embed,
                      context=context, context_mask=context_mask, mask=mask,
                      sampler=sampler)
        return x0, x1

    return pairs


class ReflowDistiller:
    """Owns the student + optimizer; one jitted reflow step.

    The student is typically initialised from the teacher's weights
    (``nnx.clone(teacher)``) so distillation is a fine-tune, not a re-train.
    """

    def __init__(self, student: CFM, cfg: ReflowConfig | None = None):
        self.cfg = cfg or ReflowConfig()
        self.student = student
        schedule = optax.join_schedules(
            [optax.linear_schedule(self.cfg.learning_rate * 0.01,
                                   self.cfg.learning_rate,
                                   self.cfg.warmup_steps),
             optax.linear_schedule(self.cfg.learning_rate,
                                   self.cfg.learning_rate * 0.01,
                                   self.cfg.decay_steps)],
            [self.cfg.warmup_steps])
        self.optimizer = nnx.Optimizer(
            student, optax.chain(optax.clip_by_global_norm(self.cfg.grad_clip),
                                 optax.adamw(schedule)), wrt=nnx.Param)
        self.step = 0

        @nnx.jit
        def _step(student, optimizer, rng, x0, x1, lens, text_embed,
                  context, context_mask):
            def loss_fn(student):
                out = student.loss(x1, lens=lens, text_embed=text_embed,
                                   context=context, context_mask=context_mask,
                                   rng=rng, x0=x0)
                return out.loss

            loss, grads = nnx.value_and_grad(loss_fn)(student)
            optimizer.update(student, grads)
            return loss

        self._step = _step

    def distill_step(self, rng: jax.Array, x0, x1, *, lens, text_embed,
                     context, context_mask) -> float:
        loss = self._step(self.student, self.optimizer, rng, x0, x1, lens,
                          text_embed, context, context_mask)
        self.step += 1
        return loss


def fewstep_sampler(steps: int = 2) -> SamplerConfig:
    """Sampler settings for a reflow-distilled student: few Euler steps, NO
    CFG (guidance was baked into the pairs; cfg_strength=0 disables the
    doubled forward, models/cfm.py:287), no sway (the straightened flow
    wants uniform timesteps)."""
    return SamplerConfig(steps=steps, cfg_strength=0.0, sway_sampling=False)

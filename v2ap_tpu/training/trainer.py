"""Training loop: optax/AdamW, warmup→decay schedule, grad clip + accumulation,
EMA, sharded pjit train step, orbax checkpointing.

Replaces the reference's ``E2Trainer`` over HF Accelerate/DDP
(trainer_multigpus_alldatas3.py:136-452). Key re-designs:
  * the NCCL gradient allreduce becomes an XLA AllReduce inserted by jit from
    the batch sharding (scaling-book recipe, SURVEY §5.8);
  * gradient accumulation is a `lax.scan` over micro-batches inside one jit;
  * checkpoints carry the *exact* state (params/opt/EMA/step/rng) via orbax —
    the reference saved model-only and always restarted schedules at step 0
    (trainer...3.py:205-216,269);
  * EMA is a first-class option (the reference had it commented out,
    trainer...3.py:173-177).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from v2ap_tpu.config import TrainConfig
from v2ap_tpu.models.cfm import CFM, CFMOutput


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """LinearLR warmup -> LinearLR decay (reference trainer...3.py:353-359)."""
    warmup = optax.linear_schedule(cfg.learning_rate * 0.01, cfg.learning_rate,
                                   cfg.warmup_steps)
    decay = optax.linear_schedule(cfg.learning_rate, cfg.learning_rate * 0.01,
                                  cfg.decay_steps)
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


def make_tx(cfg: TrainConfig) -> optax.GradientTransformation:
    import jax.numpy as jnp

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(make_lr_schedule(cfg), b1=0.9, b2=0.999, weight_decay=0.01,
                    # bf16 first moment (sign-scale info only) halves a large
                    # slab of optimizer HBM at full size; f32 by default
                    mu_dtype=jnp.bfloat16 if cfg.mu_bf16 else None),
    )


class EMA(nnx.Module):
    """Exponential moving average of model params (kept on device)."""

    def __init__(self, model: nnx.Module, decay: float):
        self.decay = decay
        self.shadow = nnx.clone(model)
        # clone shares the underlying jax.Arrays with the live model; the
        # train step donates the model's buffers, which would invalidate the
        # shadow's aliases on the very first step — copy EVERYTHING,
        # including RngState key/count buffers (params alone leave the
        # dropout streams aliased: 'f(donate(a), a)' crash under DPO)
        nnx.update(self.shadow, jax.tree.map(jnp.copy, nnx.state(model)))

    def update(self, model: nnx.Module) -> None:
        d = self.decay
        shadow_state = nnx.state(self.shadow, nnx.Param)
        model_state = nnx.state(model, nnx.Param)
        new = jax.tree.map(lambda s, p: d * s + (1.0 - d) * p,
                           shadow_state, model_state)
        nnx.update(self.shadow, new)


@dataclasses.dataclass
class TrainState:
    model: CFM
    optimizer: nnx.Optimizer
    ema: Optional[EMA]
    step: int = 0


def make_train_step(train_cfg: TrainConfig):
    """Build the jitted train step. The batch dict carries:
    latents (b,n,C), lens (b,), text_embed (b,n,dt), context (b,nc,dc),
    context_mask (b,nc), and optionally frames (b,t,H,W) + midis (b,n,notes).
    Shard batch arrays on the mesh's data axis before calling; XLA inserts the
    gradient AllReduce.

    ``TrainConfig.dpo`` / ``TrainConfig.contrastive`` fold the preference and
    FactorCL objectives into this same step (the reference produced its
    released checkpoints with these paths enabled; e2_tts_crossatt3.py:2504-
    2566, e2_tts_crossatt6.py:1027-1061):
      * DPO: rows [-2]/[-1] of each micro-batch are the winner/loser of a
        preference pair (``TrainBatcher(dpo=True, micro_batches=accum)``
        emits this layout); ``ref_model`` (the EMA shadow) scores them at the
        *same* (t, x0, span, condition-drop) draws via the shared PRNG key.
      * contrastive: layer-1 (audio, CLIP-stream) hiddens of rows 2..8 feed
        the FactorCL CLUB critic; the critic trains jointly via its InfoNCE
        learning loss.

    With ``grad_accum > 1`` the batch splits into micro-batches along axis 0
    and gradients average inside one jit (the reference used
    ``accelerator.accumulate``, trainer...3.py:379).

    The step DONATES the model/optimizer/fcl buffers (full-size f32 AdamW
    state cannot be double-buffered on a 16 GB chip). Any externally-held
    alias of the params — e.g. a second module updated with this model's
    un-copied ``nnx.state`` — is invalidated by the first step; copy with
    ``jax.tree.map(jnp.copy, ...)`` first (EMA does this internally)."""
    accum = max(1, train_cfg.grad_accum)
    use_dpo = train_cfg.dpo
    use_con = train_cfg.contrastive

    def _cfm_loss(m: CFM, rng, batch, has_frames, collect):
        return m.loss(
            batch["latents"], lens=batch["lens"],
            text_embed=batch["text_embed"], context=batch.get("context"),
            context_mask=batch.get("context_mask"), rng=rng,
            frames=batch.get("frames") if has_frames else None,
            midis=batch.get("midis") if has_frames else None,
            midi_loss_weight=train_cfg.midi_loss_weight,
            collect_hidden_layer=train_cfg.contrastive_layer
            if collect else None)

    def _loss(m: CFM, fcl, rng, batch, has_frames, ref_per_sample):
        k_loss, k_ts = jax.random.split(rng)
        out: CFMOutput = _cfm_loss(m, k_loss, batch, has_frames, use_con)
        total = out.loss
        breakdown = out.breakdown
        if use_con and batch["latents"].shape[0] >= 8:
            from v2ap_tpu.training.contrastive import (
                sample_contrastive_features)
            fa, fb, labels = sample_contrastive_features(
                out.hiddens[0], out.hiddens[1], m.cfg.num_registers, k_ts)
            loss_con = (fcl(fa, fb, labels)
                        + fcl.learning_loss(fa, fb, labels))
            total = total + train_cfg.contrastive_weight * loss_con
            breakdown = breakdown._replace(contrastive=loss_con)
        if use_dpo:
            from v2ap_tpu.training.dpo import dpo_pair_loss
            per = out.per_sample_flow
            loss_dpo = dpo_pair_loss(per[-2], per[-1], ref_per_sample[-2],
                                     ref_per_sample[-1],
                                     scale=-train_cfg.dpo_beta)
            total = total + loss_dpo
            breakdown = breakdown._replace(dpo=loss_dpo)
        return total, breakdown

    # donate model+optimizer state: without donation the updated params and
    # AdamW moments coexist with the old ones for the whole step (2x ~9 GB
    # at full size — OOM on a 16 GB chip). nnx.jit writes the new state back
    # into the same module objects, so donation is transparent to callers.
    def _ref_scores(ref_model, sub, batch, has_frames):
        # EMA-reference forward at the same draws (shared k_loss)
        k_loss, _ = jax.random.split(sub)
        ref_out = _cfm_loss(ref_model, k_loss, batch, has_frames, False)
        return jax.lax.stop_gradient(ref_out.per_sample_flow)

    @partial(nnx.jit, static_argnames=("has_frames",),
             donate_argnums=(0, 1, 2, 3))
    def train_step(model: CFM, optimizer: nnx.Optimizer, fcl, fcl_opt,
                   ref_model, rng: jax.Array, batch: dict,
                   has_frames: bool = False):
        if accum == 1:
            ref_per_sample = (_ref_scores(ref_model, rng, batch, has_frames)
                              if use_dpo else None)
            if use_con:
                (loss, breakdown), grads = nnx.value_and_grad(
                    _loss, has_aux=True, argnums=(0, 1))(
                        model, fcl, rng, batch, has_frames, ref_per_sample)
                optimizer.update(model, grads[0])
                fcl_opt.update(fcl, grads[1])
            else:
                (loss, breakdown), grads = nnx.value_and_grad(
                    _loss, has_aux=True)(
                        model, fcl, rng, batch, has_frames, ref_per_sample)
                optimizer.update(model, grads)
            return loss, breakdown

        # micro-batches unroll at trace time (accum is small; a lax.scan
        # would forbid the stateful dropout-RNG mutation inside its body).
        # DPO/contrastive terms index rows *within* each micro-batch (the
        # batcher places one preference pair at the end of every micro-slice),
        # so preference optimization composes with accumulation.
        b = batch["latents"].shape[0]
        if b % accum != 0:
            raise ValueError(
                f"batch size {b} not divisible by grad_accum {accum}")

        def micro(i):
            return jax.tree.map(
                lambda x: x.reshape((accum, -1) + x.shape[1:])[i]
                if hasattr(x, "ndim") and x.ndim > 0 else x, batch)

        g_sum = None
        gf_sum = None
        loss_sum = jnp.asarray(0.0)
        bk_sum = None
        for i in range(accum):
            sub = jax.random.fold_in(rng, i)
            mb = micro(i)
            ref_ps = (_ref_scores(ref_model, sub, mb, has_frames)
                      if use_dpo else None)
            if use_con:
                (loss, bk), (g, gf) = nnx.value_and_grad(
                    _loss, has_aux=True, argnums=(0, 1))(
                        model, fcl, sub, mb, has_frames, ref_ps)
                gf_sum = gf if gf_sum is None else jax.tree.map(
                    lambda a, c: a + c if hasattr(a, "dtype") else a,
                    gf_sum, gf)
            else:
                (loss, bk), g = nnx.value_and_grad(
                    _loss, has_aux=True)(model, fcl, sub, mb, has_frames,
                                         ref_ps)
            loss_sum = loss_sum + loss
            bk_sum = bk if bk_sum is None else jax.tree.map(
                lambda a, c: a + c, bk_sum, bk)
            g_sum = g if g_sum is None else jax.tree.map(
                lambda a, c: a + c if hasattr(a, "dtype") else a, g_sum, g)
        grads = jax.tree.map(
            lambda g: g / accum if hasattr(g, "dtype") else g, g_sum)
        optimizer.update(model, grads)
        if use_con:
            fcl_opt.update(fcl, jax.tree.map(
                lambda g: g / accum if hasattr(g, "dtype") else g, gf_sum))
        breakdown = jax.tree.map(lambda a: a / accum, bk_sum)
        return loss_sum / accum, breakdown

    return train_step


def make_eval_step(train_cfg: TrainConfig):
    """Deterministic validation forward: fixed times=0.5, centered span, no
    condition dropout (reference trainer...3.py:271-324, val path)."""

    @partial(nnx.jit, static_argnames=("has_frames", "return_pred"))
    def eval_step(model: CFM, rng: jax.Array, batch: dict,
                  has_frames: bool = False, return_pred: bool = False):
        out = model.loss(
            batch["latents"], lens=batch["lens"],
            text_embed=batch["text_embed"], context=batch.get("context"),
            context_mask=batch.get("context_mask"), rng=rng,
            frames=batch.get("frames") if has_frames else None,
            midis=batch.get("midis") if has_frames else None,
            times=0.5, val=True,
            midi_loss_weight=train_cfg.midi_loss_weight)
        if return_pred:
            # denoised-data estimate for the periodic spectrogram figures
            # (reference dumps target/mask/pred mels every save_step,
            # trainer...3.py:434-439)
            return out.loss, out.breakdown, out.pred_data
        return out.loss, out.breakdown

    return eval_step


class Trainer:
    """Host-side orchestration: epochs, grad accumulation, EMA, logging hooks,
    periodic checkpoint + eval."""

    def __init__(self, model: CFM, train_cfg: TrainConfig | None = None,
                 use_ema: bool | None = None):
        self.cfg = train_cfg or TrainConfig()
        self.model = model
        self.optimizer = nnx.Optimizer(model, make_tx(self.cfg), wrt=nnx.Param)
        use_ema = self.cfg.use_ema if use_ema is None else use_ema
        # DPO scores pairs against the EMA reference model, so preference
        # optimization implies EMA (reference velocity_consistency_model is
        # the EMA model; SURVEY §5.9)
        if self.cfg.dpo:
            use_ema = True
        self.ema = EMA(model, self.cfg.ema_decay) if use_ema else None
        self.fcl = None
        self.fcl_opt = None
        if self.cfg.contrastive:
            from v2ap_tpu.training.contrastive import FactorCL
            self.fcl = FactorCL(model.cfg.dim, model.cfg.dim_text,
                                rngs=nnx.Rngs(0))
            self.fcl_opt = nnx.Optimizer(
                self.fcl, optax.adamw(self.cfg.learning_rate), wrt=nnx.Param)
        self.step = 0
        self._train_step = make_train_step(self.cfg)
        self._eval_step = make_eval_step(self.cfg)

    def train_step(self, rng: jax.Array, batch: dict) -> tuple:
        has_frames = "frames" in batch and batch["frames"] is not None
        ref = self.ema.shadow if (self.cfg.dpo and self.ema) else None
        loss, breakdown = self._train_step(self.model, self.optimizer,
                                           self.fcl, self.fcl_opt, ref, rng,
                                           batch, has_frames=has_frames)
        if self.ema is not None:
            self.ema.update(self.model)
        self.step += 1
        return loss, breakdown

    def eval_step(self, rng: jax.Array, batch: dict,
                  return_pred: bool = False) -> tuple:
        has_frames = "frames" in batch and batch["frames"] is not None
        return self._eval_step(self.model, rng, batch, has_frames=has_frames,
                               return_pred=return_pred)

    def switch_ema(self) -> None:
        """Copy the EMA shadow's params into the live model ("switch EMA",
        arXiv 2402.09240 — the reference imports the flag but left it dead,
        trainer_multigpus_alldatas3.py:449-450). Typical use: once per epoch;
        the optimizer moments are kept so training continues smoothly."""
        if self.ema is None:
            raise ValueError("switch_ema requires use_ema=True")
        nnx.update(self.model, jax.tree.map(
            jnp.copy, nnx.state(self.ema.shadow, nnx.Param)))

    def run(self, batches: Iterator[dict], *, num_steps: int,
            rng: jax.Array, log_every: int = 50,
            callback=None) -> None:
        for i, batch in zip(range(num_steps), batches):
            rng, sub = jax.random.split(rng)
            loss, breakdown = self.train_step(sub, batch)
            if callback is not None and (i % log_every == 0):
                callback(self.step, float(loss), breakdown)

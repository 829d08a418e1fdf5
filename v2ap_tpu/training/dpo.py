"""DPO-style preference optimization + velocity-consistency regularisation.

The reference ships these as commented-out code paths that produced its
released "combined preference optimization" checkpoints
(e2_tts_crossatt3.py:2504-2566, trainer...3.py:1316-1328, SURVEY §5.9).
Here they are first-class:

  * batches carry (winner, loser) latent pairs in the last two rows;
  * both policy and frozen reference models score each row with the
    per-sample masked flow-matching loss at shared (t, x0, span);
  * DPO loss = -logsigmoid( scale * ((w - l) - (w_ref - l_ref)) ) with the
    reference's scale = -1 (prefer the winner's loss to *drop* relative to
    the reference model);
  * optional velocity-consistency: MSE(ref_pred, flow) as an EMA-teacher
    regulariser (weight <= 0 disables, matching the reference default).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from flax import nnx

from v2ap_tpu.models.cfm import CFM
from v2ap_tpu.ops import lens_to_mask, mask_from_frac_lengths


def per_sample_flow_loss(pred: jnp.ndarray, flow: jnp.ndarray,
                         span_mask: jnp.ndarray) -> jnp.ndarray:
    """(b, n, c) -> (b,): feature-mean MSE averaged over the masked span."""
    per = jnp.mean((pred - flow) ** 2, axis=-1)            # (b, n)
    num = jnp.sum(jnp.where(span_mask, per, 0.0), axis=-1)
    den = jnp.maximum(span_mask.sum(axis=-1), 1)
    return num / den


def dpo_pair_loss(w: jnp.ndarray, l: jnp.ndarray, w_ref: jnp.ndarray,
                  l_ref: jnp.ndarray, scale: float = -1.0) -> jnp.ndarray:
    inside = scale * ((w - l) - (w_ref - l_ref))
    return -jax.nn.log_sigmoid(inside).mean()


def make_dpo_train_step(*, dpo_scale: float = -1.0,
                        velocity_consistency_weight: float = -1e-5):
    """Jitted preference-optimization step. Batch layout: rows [:-2] are
    ordinary samples, rows [-2] / [-1] are the winner / loser of a preference
    pair sharing the same conditioning."""

    @nnx.jit
    def step(model: CFM, ref_model: CFM, optimizer: nnx.Optimizer,
             rng: jax.Array, batch: dict):
        x1 = batch["latents"].astype(jnp.float32)
        lens = batch["lens"]
        b, n, c = x1.shape
        mask = lens_to_mask(lens, n)

        k_frac, k_start, k_x0, k_t = jax.random.split(rng, 4)
        frac = jnp.ones((b,), jnp.float32)
        start = jax.random.uniform(k_start, (b,))
        span = mask_from_frac_lengths(lens, frac, n, start) & mask
        x0 = jax.random.normal(k_x0, x1.shape)
        t = jax.random.uniform(k_t, (b,))
        tb = t[:, None, None]
        w = (1.0 - tb) * x0 + tb * x1
        flow = x1 - x0

        def fwd(m):
            return m.pred_head(
                w, None, times=t, mask=mask,
                text_embed=batch["text_embed"],
                frames_embed=batch.get(
                    "frames_roll",
                    jnp.zeros((b, n, m.cfg.notes), jnp.float32)),
                context=batch.get("context"),
                context_mask=batch.get("context_mask"))

        ref_pred = jax.lax.stop_gradient(fwd(ref_model))
        ref_losses = per_sample_flow_loss(ref_pred, flow, span)

        def loss_fn(m):
            pred = fwd(m)
            sample_losses = per_sample_flow_loss(pred, flow, span)
            loss_fm = sample_losses.mean()
            loss_dpo = dpo_pair_loss(sample_losses[-2], sample_losses[-1],
                                     ref_losses[-2], ref_losses[-1],
                                     scale=dpo_scale)
            loss_vc = jnp.mean((ref_pred - flow) ** 2)
            total = loss_fm + loss_dpo
            if velocity_consistency_weight > 0:
                total = total + velocity_consistency_weight * loss_vc
            return total, (loss_fm, loss_dpo)

        (loss, (loss_fm, loss_dpo)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return loss, loss_fm, loss_dpo

    return step

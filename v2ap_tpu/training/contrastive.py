"""FactorCL-style contrastive audio<->video alignment loss.

Re-design of the variant-6 stack (reference: e2_tts_crossatt6.py:884,
1027-1061; multibench_model.py:150-283; critic_objectives.py:131-166): the
layer-1 audio hidden states and CLIP-stream hidden states of the batch's
video rows are projected by small MLP heads, concatenated with a one-hot
row label, and scored by a CLUB critic (contrastive log-ratio upper bound)
whose InfoNCE "learning loss" trains the critic network itself.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx


def _l2norm(x, eps=1e-12):
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, -1, keepdims=True),
                                    eps * eps))


class MLPHead(nnx.Module):
    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(dim, dim, param_dtype=jnp.float32, rngs=rngs)
        self.fc2 = nnx.Linear(dim, dim, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        return self.fc2(nnx.relu(self.fc1(x)))


class CLUBCritic(nnx.Module):
    """Scalar critic f([y, x]); CLUB bound + InfoNCE learning loss."""

    def __init__(self, a_dim: int, b_dim: int, hidden: int = 512, *,
                 rngs: nnx.Rngs):
        kw = dict(param_dtype=jnp.float32, rngs=rngs)
        self.fc1 = nnx.Linear(a_dim + b_dim, hidden, **kw)
        self.fc2 = nnx.Linear(hidden, 1, **kw)

    def _f(self, x):
        return self.fc2(nnx.relu(self.fc1(x)))

    def _scores(self, x, y):
        n = x.shape[0]
        t0 = self._f(jnp.concatenate([y, x], axis=-1))          # (n, 1) paired
        x_tile = jnp.broadcast_to(x[None], (n, n, x.shape[-1]))
        y_tile = jnp.broadcast_to(y[:, None], (n, n, y.shape[-1]))
        t1 = self._f(jnp.concatenate([y_tile, x_tile], axis=-1))  # (n, n, 1)
        return t0, t1

    def club(self, x, y):
        t0, t1 = self._scores(x, y)
        return -(t0.mean() - t1.mean())

    def infonce_learning_loss(self, x, y):
        t0, t1 = self._scores(x, y)
        n = x.shape[0]
        lower = t0.mean() - (jax.nn.logsumexp(t1[..., 0], axis=1).mean()
                             - np.log(n))
        return -lower


class FactorCL(nnx.Module):
    """Audio-hidden x CLIP-hidden conditional CLUB loss with one-hot row
    labels (the reference's ``FactorCLSUP(None, [dim, dim_text], 6)``)."""

    def __init__(self, dim_a: int, dim_b: int, num_labels: int = 6, *,
                 rngs: nnx.Rngs):
        self.num_labels = num_labels
        self.head_a = MLPHead(dim_a, rngs=rngs)
        self.head_b = MLPHead(dim_b, rngs=rngs)
        self.critic = CLUBCritic(dim_a + num_labels, dim_b + num_labels,
                                 rngs=rngs)

    def _project(self, a, b, labels):
        a = self.head_a(_l2norm(a))
        b = self.head_b(_l2norm(b))
        ohe = jax.nn.one_hot(labels, self.num_labels)
        return (jnp.concatenate([a, ohe], -1), jnp.concatenate([b, ohe], -1))

    def __call__(self, audio_feats, clip_feats, labels):
        """(n, dim_a), (n, dim_b), (n,) int labels -> scalar CLUB loss."""
        a, b = self._project(audio_feats, clip_feats, labels)
        return self.critic.club(a, b)

    def learning_loss(self, audio_feats, clip_feats, labels):
        a, b = self._project(audio_feats, clip_feats, labels)
        return self.critic.infonce_learning_loss(a, b)


def sample_contrastive_features(audio_hidden: jnp.ndarray,
                                text_hidden: jnp.ndarray,
                                num_registers: int,
                                rng: jax.Array,
                                rows: slice = slice(2, 8)) -> tuple:
    """Pick the reference's feature rows: batch rows 2..8 of the layer-1
    hidden states, one random timestep, registers stripped
    (e2_tts_crossatt6.py:1040-1056)."""
    a = audio_hidden[rows, num_registers:, :]
    b = text_hidden[rows, num_registers:, :]
    t = jax.random.randint(rng, (), 0, a.shape[1])
    a = a[:, t, :]
    b = b[:, t, :]
    labels = jnp.arange(a.shape[0])
    return a, b, labels


def make_contrastive_train_step(fcl: FactorCL, *, layer: int = 1,
                                weight: float = 1.0,
                                min_batch: int = 8):
    """Variant-6 train step: flow-matching loss + FactorCL CLUB alignment on
    the layer-``layer`` hidden states of batch rows 2..8 (reference
    e2_tts_crossatt6.py:1027-1061: contrastive only when batch >= 8).

    The FactorCL heads/critic train jointly through the combined loss; its
    InfoNCE learning loss trains the critic's density-ratio estimate."""
    from flax import nnx
    from v2ap_tpu.ops import lens_to_mask

    @nnx.jit
    def step(model, fcl_mod, optimizer, fcl_opt, rng, batch):
        x1 = batch["latents"].astype(jnp.float32)
        lens = batch["lens"]
        b, n, c = x1.shape
        mask = lens_to_mask(lens, n)
        k_x0, k_t, k_ts = jax.random.split(rng, 3)
        x0 = jax.random.normal(k_x0, x1.shape)
        t = jax.random.uniform(k_t, (b,))
        w = (1.0 - t[:, None, None]) * x0 + t[:, None, None] * x1
        flow = x1 - x0

        def loss_fn(m, f):
            pred, (ah, th) = m.pred_head(
                w, None, times=t, mask=mask,
                text_embed=batch["text_embed"],
                frames_embed=jnp.zeros((b, n, m.cfg.notes), jnp.float32),
                context=batch.get("context"),
                context_mask=batch.get("context_mask"),
                collect_hidden_layer=layer)
            loss_fm = jnp.mean(
                jnp.where(mask[..., None], (pred - flow) ** 2, 0.0)
            ) * (mask.size * c) / jnp.maximum(mask.sum() * c, 1)
            if b >= min_batch:
                fa, fb, labels = sample_contrastive_features(
                    ah, th, m.cfg.num_registers, k_ts)
                loss_con = f(fa, fb, labels) + f.learning_loss(fa, fb, labels)
            else:
                loss_con = jnp.asarray(0.0)
            return loss_fm + weight * loss_con, (loss_fm, loss_con)

        (loss, (loss_fm, loss_con)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True, argnums=(0, 1))(model, fcl_mod)
        optimizer.update(model, grads[0])
        fcl_opt.update(fcl_mod, grads[1])
        return loss, loss_fm, loss_con

    return step

"""Training loops for the Audeo subsystem.

* Video2Roll: BCE-with-logits multilabel training with Adam 1e-3 and
  plateau-style LR decay, best-F1 checkpoint selection (reference:
  Video2Roll_train.py:12-26, Video2Roll_solver.py:42-144).
* Roll2Midi: LSGAN training — G loss = 0.001*MSE(D(fake), 1) +
  0.999*MSE(fake, gt), D loss = (MSE(D(real),1) + MSE(D(fake),0))/2
  (reference: Roll2Midi_train.py:52-110,221-233).

Both steps are single jitted programs; oversampling/balancing stays on host
(datasets.py).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import optax
from flax import nnx

from v2ap_tpu.audeo.roll2midi import Roll2MidiDiscriminator, Roll2MidiGenerator
from v2ap_tpu.models.video2roll import Video2RollNet


# ------------------------------------------------------------- video2roll

def make_video2roll_step(lr: float = 1e-3):
    tx = optax.adam(lr, b1=0.9, b2=0.999)

    @nnx.jit
    def step(model: Video2RollNet, optimizer: nnx.Optimizer,
             frames: jnp.ndarray, labels: jnp.ndarray):
        def loss_fn(m):
            logits = m(frames, train=True)
            loss = optax.sigmoid_binary_cross_entropy(
                logits, labels.astype(jnp.float32)).mean()
            return loss, logits

        (loss, logits), grads = nnx.value_and_grad(loss_fn, has_aux=True)(model)
        optimizer.update(model, grads)
        return loss, logits

    return tx, step


class Video2RollTrainer:
    """Epoch loop with plateau LR handling and best-F1 tracking."""

    def __init__(self, model: Video2RollNet, lr: float = 1e-3,
                 patience: int = 2):
        self.model = model
        self.tx, self._step = make_video2roll_step(lr)
        self.optimizer = nnx.Optimizer(model, self.tx, wrt=nnx.Param)
        self.best_f1 = 0.0
        self.patience = patience
        self._bad_epochs = 0
        self.history = []

    def train_epoch(self, batches: Iterator[tuple], max_steps: int | None = None):
        total, n = 0.0, 0
        for i, (frames, labels) in enumerate(batches):
            if max_steps is not None and i >= max_steps:
                break
            loss, _ = self._step(self.model, self.optimizer,
                                 jnp.asarray(frames), jnp.asarray(labels))
            total += float(loss)
            n += 1
        avg = total / max(n, 1)
        self.history.append(avg)
        if len(self.history) > 1 and avg >= self.history[-2]:
            self._bad_epochs += 1
        else:
            self._bad_epochs = 0
        return avg


# --------------------------------------------------------------- roll2midi

def make_roll2midi_steps(g_lr: float = 5e-4, d_lr: float = 1e-3,
                         adv_weight: float = 0.001):
    g_tx = optax.adam(g_lr, b1=0.9, b2=0.999)
    d_tx = optax.adam(d_lr, b1=0.9, b2=0.999)

    @nnx.jit
    def g_step(gen: Roll2MidiGenerator, disc: Roll2MidiDiscriminator,
               g_opt: nnx.Optimizer, roll: jnp.ndarray, gt: jnp.ndarray):
        def loss_fn(g):
            fake = g(roll, train=True, deterministic=False)
            d_out = disc(fake)
            adv = jnp.mean((d_out - 1.0) ** 2)
            rec = jnp.mean((fake - gt) ** 2)
            return adv_weight * adv + (1.0 - adv_weight) * rec, (adv, rec)

        (loss, (adv, rec)), grads = nnx.value_and_grad(
            loss_fn, has_aux=True)(gen)
        g_opt.update(gen, grads)
        return loss, adv, rec

    @nnx.jit
    def d_step(gen: Roll2MidiGenerator, disc: Roll2MidiDiscriminator,
               d_opt: nnx.Optimizer, roll: jnp.ndarray, gt: jnp.ndarray):
        fake = jax.lax.stop_gradient(gen(roll, train=False))

        def loss_fn(d):
            real_loss = jnp.mean((d(gt) - 1.0) ** 2)
            fake_loss = jnp.mean(d(fake) ** 2)
            return 0.5 * (real_loss + fake_loss)

        loss, grads = nnx.value_and_grad(loss_fn)(disc)
        d_opt.update(disc, grads)
        return loss

    return g_tx, d_tx, g_step, d_step


class Roll2MidiTrainer:
    def __init__(self, gen: Roll2MidiGenerator, disc: Roll2MidiDiscriminator,
                 g_lr: float = 5e-4, d_lr: float = 1e-3):
        self.gen, self.disc = gen, disc
        g_tx, d_tx, self._g_step, self._d_step = make_roll2midi_steps(g_lr, d_lr)
        self.g_opt = nnx.Optimizer(gen, g_tx, wrt=nnx.Param)
        self.d_opt = nnx.Optimizer(disc, d_tx, wrt=nnx.Param)

    def step(self, roll, gt):
        roll = jnp.asarray(roll)
        gt = jnp.asarray(gt)
        g_loss, adv, rec = self._g_step(self.gen, self.disc, self.g_opt,
                                        roll, gt)
        d_loss = self._d_step(self.gen, self.disc, self.d_opt, roll, gt)
        return float(g_loss), float(d_loss), float(adv), float(rec)

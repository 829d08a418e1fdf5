"""Conditional flow-matching model over EnCodec latents (the reference's
``E2TTS``, e2_tts_crossatt3.py:1275-2588 — re-designed TPU-first).

Composition:
  latents (b, n, 128)  --proj_in-->  audio stream
  CLIP frame embeds (b, n, 1280)     text stream (zeroed when dropped)
  piano-roll probs (b, n, notes) --proj_frames--> frames stream
  T5 prompt states (b, nc, 1024)     cross-attention context
  times (b,)                         AdaLN conditioning

Inference = one jitted `lax.scan` Euler integration over a sway schedule with
classifier-free guidance folded into a single batch-doubled forward per step
(the reference runs two sequential forwards per step through torchdiffeq,
e2_tts_crossatt3.py:2099-2104,2255).

Training = span-masked flow-matching MSE + MIDI auxiliary loss (x10) on the
Video2Roll stream, with per-sample condition dropout driven by explicit PRNG
keys instead of python `random()`.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import nnx

from v2ap_tpu.config import ModelConfig, ConditioningConfig, SamplerConfig
from v2ap_tpu.models.transformer import TriStreamTransformer
from v2ap_tpu.models.video2roll import Video2RollNet
from v2ap_tpu.ops import (
    euler_integrate,
    lens_to_mask,
    mask_from_frac_lengths,
    project_parallel,
    sway_timesteps,
)


class LossBreakdown(NamedTuple):
    flow: jnp.ndarray
    midi: jnp.ndarray
    precision: jnp.ndarray
    recall: jnp.ndarray
    f1: jnp.ndarray
    accuracy: jnp.ndarray
    # auxiliary training objectives, filled in by the train step when
    # TrainConfig.dpo / .contrastive are enabled (0.0 otherwise)
    dpo: Any = 0.0
    contrastive: Any = 0.0


class CFMOutput(NamedTuple):
    loss: jnp.ndarray
    pred_flow: jnp.ndarray
    pred_data: jnp.ndarray
    breakdown: LossBreakdown
    # per-sample masked flow loss (b,): the DPO winner/loser scores
    # (reference e2_tts_crossatt3.py:2549-2558 `(loss.mean(-1)*span).mean(-1)`)
    per_sample_flow: Optional[jnp.ndarray] = None
    # (audio_hidden, text_hidden) at ``collect_hidden_layer`` for FactorCL
    hiddens: Optional[tuple] = None


class CFM(nnx.Module):
    def __init__(self, cfg: ModelConfig, cond_cfg: ConditioningConfig | None = None,
                 *, with_video2roll: bool = True,
                 text_num_embeds: int | None = None,
                 interpolated_text: bool = False, rngs: nnx.Rngs):
        self.cfg = cfg
        self.cond_cfg = cond_cfg or ConditioningConfig()
        dtype = jnp.dtype(cfg.dtype)

        self.transformer = TriStreamTransformer(cfg, rngs=rngs)

        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        if cfg.concat_cond:
            self.proj_in = nnx.Linear(cfg.num_channels * 2, cfg.dim, **kw)
            self.cond_proj_in = None
        else:
            self.proj_in = nnx.Linear(cfg.num_channels, cfg.dim, **kw)
            self.cond_proj_in = (
                nnx.Linear(cfg.num_channels, cfg.dim,
                           use_bias=cfg.cond_proj_in_bias, **kw)
                if cfg.if_cond_proj_in else None)
        self.to_pred = nnx.Linear(cfg.dim, cfg.num_channels, **kw)
        self.proj_frames = nnx.Linear(cfg.notes, cfg.dim_frames, **kw)
        # "mixed" video-encoder mode: concat of several frame encoders gets
        # projected to the text-stream width (reference proj_text, :1465)
        self.proj_text = (nnx.Linear(cfg.dim_text_raw, cfg.dim_text, **kw)
                          if cfg.dim_text_raw else None)

        # trained piano-perception net living inside the model
        # (reference e2_tts_crossatt3.py:1523)
        self.video2roll = (Video2RollNet(num_classes=cfg.notes, dtype=dtype,
                                         rngs=rngs)
                           if with_video2roll else None)

        # TTS-side token conditioning: char/phoneme ids -> text stream
        # (reference embed_text, e2_tts_crossatt3.py:1393-1395; the shipped
        # V2A configs bypass this — the text stream carries CLIP features)
        if text_num_embeds is not None:
            from v2ap_tpu.models.duration import (
                CharacterEmbed, InterpolatedCharacterEmbed)
            klass = (InterpolatedCharacterEmbed if interpolated_text
                     else CharacterEmbed)
            self.embed_text = klass(cfg.dim_text, text_num_embeds, rngs=rngs)
        else:
            self.embed_text = None

    def embed_tokens(self, tokens: jnp.ndarray, length: int) -> jnp.ndarray:
        """Token ids (b, nt; -1 pad) -> text-stream features (b, length,
        dim_text) for the TTS path."""
        assert self.embed_text is not None, \
            "construct CFM with text_num_embeds for token conditioning"
        return self.embed_text(tokens, length)

    # ------------------------------------------------------------------ core
    def pred_head(
        self,
        x: jnp.ndarray,                       # (b, n, C) noisy latents
        cond: Optional[jnp.ndarray],          # (b, n, C) audio infill cond or None
        *,
        times: jnp.ndarray,                   # (b,)
        mask: Optional[jnp.ndarray],          # (b, n)
        text_embed: jnp.ndarray,              # (b, n, dim_text)
        frames_embed: jnp.ndarray,            # (b, n, notes) roll probabilities
        context: Optional[jnp.ndarray],       # (b, nc, dim_context)
        context_mask: Optional[jnp.ndarray],  # (b, nc)
        deterministic: bool = True,
        collect_hidden_layer: Optional[int] = None,
    ) -> jnp.ndarray:
        """One transformer evaluation -> predicted flow (b, n, C).

        Condition dropping is expressed by the caller zeroing the tensors
        (matching the reference's semantics of zeroing *after* encoding,
        e2_tts_crossatt3.py:2015-2062). ``collect_hidden_layer`` additionally
        returns (audio, clip-stream) hiddens at that layer for the FactorCL
        contrastive loss (the variant-6 model family,
        e2_tts_crossatt6.py:1027-1061).
        """
        if cond is not None and self.cfg.concat_cond:
            h = self.proj_in(jnp.concatenate([cond, x], axis=-1))
        else:
            h = self.proj_in(x)
            if cond is not None and self.cond_proj_in is not None:
                h = h + self.cond_proj_in(cond)

        if self.proj_text is not None and \
                text_embed.shape[-1] != self.cfg.dim_text:
            text_embed = self.proj_text(text_embed)
        frames_stream = self.proj_frames(frames_embed)

        out = self.transformer(
            h, times=times, mask=mask, text_embed=text_embed,
            frames_embed=frames_stream, context=context,
            context_mask=context_mask, deterministic=deterministic,
            collect_hidden_layer=collect_hidden_layer)
        if collect_hidden_layer is not None:
            out, collected = out
            return self.to_pred(out).astype(jnp.float32), collected
        return self.to_pred(out).astype(jnp.float32)

    # ------------------------------------------------------------- perception
    def encode_frames(self, frames: jnp.ndarray, length: int) -> jnp.ndarray:
        """Keyboard frames (b, t, H, W) -> roll probabilities (b, length, notes).

        5-frame sliding windows with edge clamping, Video2RollNet + sigmoid,
        x3 temporal repeat to the 75 Hz latent rate, zero-pad/trim to
        ``length`` (reference e2_tts_crossatt3.py:1525-1555). The window stack
        is a vectorised pad+gather instead of a python loop.
        """
        assert self.video2roll is not None
        b, t, hh, ww = frames.shape
        w = self.cond_cfg.piano_window
        half = w // 2
        padded = jnp.pad(frames, ((0, 0), (half, half), (0, 0), (0, 0)),
                         mode="edge")
        # windows[:, i] = padded[:, i : i + w]  -> (b, t, w, H, W)
        idx = jnp.arange(t)[:, None] + jnp.arange(w)[None, :]
        windows = padded[:, idx]                              # (b, t, w, H, W)
        stacked = windows.reshape(b * t, w, hh, ww)
        logits = self.video2roll(stacked)                     # (b*t, notes)
        probs = nnx.sigmoid(logits.astype(jnp.float32))
        probs = probs.reshape(b, t, self.cfg.notes)
        vm = self.cfg.video_multi
        if float(vm).is_integer():
            probs = jnp.repeat(probs, int(vm), axis=1)        # (b, t*vm, notes)
        else:
            # fractional rate (88-key variant, x2.5): repeat x5 then average
            # adjacent pairs (reference e2_tts_crossatt3_2.py's t*5//2 path)
            num, den = float(vm).as_integer_ratio()           # 5, 2
            rep = jnp.repeat(probs, num, axis=1)
            t5 = (rep.shape[1] // den) * den
            probs = rep[:, :t5].reshape(b, t5 // den, den,
                                        self.cfg.notes).mean(axis=2)
        cur = probs.shape[1]
        if cur > length:
            probs = probs[:, :length]
        elif cur < length:
            probs = jnp.pad(probs, ((0, 0), (0, length - cur), (0, 0)))
        return probs

    # ---------------------------------------------------------------- sample
    def sample(
        self,
        x0: jnp.ndarray,                      # (b, n, C) gaussian noise
        *,
        text_embed: jnp.ndarray,              # (b, n, dim_text) CLIP features
        frames_embed: jnp.ndarray,            # (b, n, notes) roll probs
        context: Optional[jnp.ndarray],
        context_mask: Optional[jnp.ndarray],
        mask: Optional[jnp.ndarray],
        sampler: SamplerConfig,
        cond: Optional[jnp.ndarray] = None,       # audio infill condition
        cond_mask: Optional[jnp.ndarray] = None,  # (b, n) True where cond fixed
        drop_prompt: Optional[jnp.ndarray] = None,  # (b,) zero T5 ctx per sample
    ) -> jnp.ndarray:
        """Euler-integrate the flow ODE from noise to data latents.

        CFG (strength s): full and null branches are folded into one
        batch-doubled forward per step; null drops audio cond + CLIP stream +
        T5 prompt but keeps the piano-roll stream (matching reference
        cfg_transformer_with_pred_head semantics).
        """
        fn = self._make_cfg_fn(
            batch=x0.shape[0], text_embed=text_embed,
            frames_embed=frames_embed, context=context,
            context_mask=context_mask, mask=mask, sampler=sampler,
            cond=cond, cond_mask=cond_mask, drop_prompt=drop_prompt)
        ts = jnp.asarray(sway_timesteps(sampler.steps, sampler.sway_sampling))
        out = euler_integrate(fn, x0.astype(jnp.float32), ts,
                              method=sampler.method)
        if cond is not None and cond_mask is not None:
            out = jnp.where(cond_mask[..., None], cond, out)
        return out

    def sample_multipass(
        self,
        x0: jnp.ndarray,
        *,
        rng: jax.Array,
        passes: int = 2,
        restart_t: float = 0.6,
        refine_steps: Optional[int] = None,
        text_embed: jnp.ndarray,
        frames_embed: jnp.ndarray,
        context: Optional[jnp.ndarray],
        context_mask: Optional[jnp.ndarray],
        mask: Optional[jnp.ndarray],
        sampler: SamplerConfig,
        drop_prompt: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Multi-pass refinement sampling (restart sampling): after the full
        ODE pass, partially re-noise the result back to ``restart_t`` along
        the flow path and re-integrate t: restart_t -> 1. Extra passes trade
        compute for sample quality (the "multi-pass CFM refinement" serving
        config; BASELINE config 4)."""
        out = self.sample(x0, text_embed=text_embed, frames_embed=frames_embed,
                          context=context, context_mask=context_mask,
                          mask=mask, sampler=sampler, drop_prompt=drop_prompt)
        fn = self._make_cfg_fn(
            batch=x0.shape[0], text_embed=text_embed,
            frames_embed=frames_embed, context=context,
            context_mask=context_mask, mask=mask, sampler=sampler,
            cond=None, cond_mask=None, drop_prompt=drop_prompt)
        steps = refine_steps or max(sampler.steps // 2, 2)
        base = jnp.asarray(sway_timesteps(steps, sampler.sway_sampling))
        ts = restart_t + (1.0 - restart_t) * base
        for p in range(1, passes):
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, out.shape, jnp.float32)
            x_restart = (1.0 - restart_t) * noise + restart_t * out
            out = euler_integrate(fn, x_restart, ts, method=sampler.method)
        return out

    def _make_cfg_fn(self, *, batch, text_embed, frames_embed, context,
                     context_mask, mask, sampler: SamplerConfig,
                     cond=None, cond_mask=None, drop_prompt=None):
        """Velocity field with CFG folded into one batch-doubled forward."""
        b = batch

        if drop_prompt is not None and context is not None:
            context = jnp.where(drop_prompt[:, None, None], 0.0, context)

        use_cfg = sampler.cfg_strength >= 1e-5

        if use_cfg:
            text2 = jnp.concatenate([text_embed, jnp.zeros_like(text_embed)], 0)
            frames2 = jnp.concatenate([frames_embed, frames_embed], 0)
            ctx2 = (jnp.concatenate([context, jnp.zeros_like(context)], 0)
                    if context is not None else None)
            ctxm2 = (jnp.concatenate([context_mask, context_mask], 0)
                     if context_mask is not None else None)
            mask2 = jnp.concatenate([mask, mask], 0) if mask is not None else None
        else:
            text2, frames2, ctx2, ctxm2, mask2 = (
                text_embed, frames_embed, context, context_mask, mask)

        def fn(t, x):
            if cond is not None and cond_mask is not None:
                step_cond = jnp.where(cond_mask[..., None], cond, 0.0)
            else:
                step_cond = None

            if not use_cfg:
                times = jnp.full((b,), t, jnp.float32)
                return self.pred_head(
                    x, step_cond, times=times, mask=mask2, text_embed=text2,
                    frames_embed=frames2, context=ctx2, context_mask=ctxm2)

            xb = jnp.concatenate([x, x], 0)
            condb = (jnp.concatenate([step_cond, jnp.zeros_like(step_cond)], 0)
                     if step_cond is not None else None)
            times = jnp.full((2 * b,), t, jnp.float32)
            predb = self.pred_head(
                xb, condb, times=times, mask=mask2, text_embed=text2,
                frames_embed=frames2, context=ctx2, context_mask=ctxm2)
            pred, null_pred = predb[:b], predb[b:]
            update = pred - null_pred
            if sampler.remove_parallel_component:
                parallel, orthogonal = project_parallel(update, pred)
                update = orthogonal + parallel * sampler.keep_parallel_frac
            return pred + update * sampler.cfg_strength

        return fn

    # ------------------------------------------------------------------ loss
    def loss(
        self,
        x1: jnp.ndarray,                     # (b, n, C) target latents
        *,
        lens: jnp.ndarray,                   # (b,)
        text_embed: jnp.ndarray,             # (b, n, dim_text)
        context: Optional[jnp.ndarray],
        context_mask: Optional[jnp.ndarray],
        rng: jax.Array,
        frames: Optional[jnp.ndarray] = None,   # (b, t, H, W) keyboard frames
        midis: Optional[jnp.ndarray] = None,    # (b, n, notes) gt roll
        times: Optional[jnp.ndarray] = None,    # fixed times (val) or None
        x0: Optional[jnp.ndarray] = None,    # coupled noise (reflow distillation)
        val: bool = False,
        midi_loss_weight: float = 10.0,
        train_video_encoder: bool = True,
        use_midi_gt: bool = False,
        collect_hidden_layer: Optional[int] = None,
    ) -> CFMOutput:
        """Flow-matching training objective (reference forward, :2307-2588)."""
        cfg = self.cfg
        b, n, c = x1.shape
        mask = lens_to_mask(lens, n)

        k_frac, k_start, k_x0, k_t, k_drop_a, k_drop_t, k_drop_p = (
            jax.random.split(rng, 7))

        # random span mask for infilling cond (degenerate full-span when
        # audio conditioning is disabled, reference :2352-2362)
        if not val:
            if self.cond_cfg.audiocond_drop_prob > 1.0:
                frac = jnp.ones((b,), jnp.float32)
            else:
                lo, hi = self.cond_cfg.frac_lengths_mask
                frac = jax.random.uniform(k_frac, (b,), minval=lo, maxval=hi)
            start_rand = jax.random.uniform(k_start, (b,))
        else:
            lo, hi = self.cond_cfg.frac_lengths_mask
            frac = jnp.full((b,), (lo + hi) / 2.0, jnp.float32)
            start_rand = jnp.full((b,), 0.5, jnp.float32)
        rand_span_mask = mask_from_frac_lengths(lens, frac, n, start_rand) & mask

        if x0 is None:
            x0 = jax.random.normal(k_x0, x1.shape, jnp.float32)
        else:
            # reflow: (x0, x1) arrive as a coupled pair from a teacher
            # trajectory (training/distill.py) — straightens the flow so
            # few-step Euler sampling matches many-step quality
            x0 = x0.astype(jnp.float32)
        x1 = x1.astype(jnp.float32)

        if times is None:
            t = jax.random.uniform(k_t, (b,), jnp.float32)
        else:
            t = jnp.broadcast_to(jnp.asarray(times, jnp.float32), (b,))
        tb = t[:, None, None]

        w = (1.0 - tb) * x0 + tb * x1
        flow = x1 - x0

        if self.cond_cfg.audiocond_drop_prob > 1.0:
            cond = None
        else:
            cond = jnp.where(rand_span_mask[..., None], 0.0, x1)

        # ---- piano-roll stream + MIDI auxiliary loss
        zero = jnp.asarray(0.0, jnp.float32)
        if frames is None:
            frames_embed = jnp.zeros((b, n, cfg.notes), jnp.float32)
            midis_eff = jnp.zeros((b, n, cfg.notes), jnp.float32)
            loss_midi = zero
            pre = rec = f1 = acc = zero
        else:
            midis_eff = midis.astype(jnp.float32)
            if train_video_encoder:
                frames_embed = self.encode_frames(frames, n)
                # weighted MSE vs gt roll (reference :2427-2434)
                lw = jnp.abs(midis_eff - 0.10)
                per = (frames_embed - midis_eff) ** 2 * lw
                denom = jnp.maximum(mask.sum() * cfg.notes, 1)
                loss_midi = jnp.where(mask[..., None], per, 0.0).sum() / denom
                pre, rec, f1, acc = _roll_metrics(frames_embed, midis_eff, mask)
            else:
                frames_embed = midis_eff
                loss_midi = zero
                pre = rec = f1 = acc = zero
            if use_midi_gt:
                frames_embed = midis_eff

        # ---- condition dropout (explicit PRNG; reference used python random)
        if not val:
            drop_audio = (jax.random.uniform(k_drop_a, (b,))
                          < self.cond_cfg.audiocond_drop_prob)
            drop_text = (jax.random.uniform(k_drop_t, ())
                         < self.cond_cfg.cond_drop_prob)
            drop_prompt = (jax.random.uniform(k_drop_p, (b,))
                           < self.cond_cfg.prompt_drop_prob)
        else:
            drop_audio = jnp.zeros((b,), bool)
            drop_text = jnp.asarray(False)
            drop_prompt = jnp.zeros((b,), bool)

        if cond is not None:
            cond = jnp.where(drop_audio[:, None, None], 0.0, cond)
        text_in = jnp.where(drop_text, 0.0, text_embed)
        ctx_in = context
        if context is not None:
            ctx_in = jnp.where(drop_prompt[:, None, None], 0.0, context)

        pred = self.pred_head(
            w, cond, times=t, mask=mask, text_embed=text_in,
            frames_embed=frames_embed, context=ctx_in,
            context_mask=context_mask, deterministic=val,
            collect_hidden_layer=collect_hidden_layer)
        hiddens = None
        if collect_hidden_layer is not None:
            pred, hiddens = pred

        per = (pred - flow) ** 2
        span = rand_span_mask[..., None]
        loss_flow = jnp.where(span, per, 0.0).sum() / jnp.maximum(
            rand_span_mask.sum() * c, 1)
        # per-sample score for preference pairs: span-masked feature-mean MSE
        # averaged over the full length (reference :2549-2558)
        per_sample = (per.mean(-1) * rand_span_mask).mean(-1)

        total = loss_flow + loss_midi * midi_loss_weight
        breakdown = LossBreakdown(loss_flow, loss_midi, pre, rec, f1, acc)
        return CFMOutput(total, pred, x0 + pred, breakdown,
                         per_sample_flow=per_sample, hiddens=hiddens)


def _roll_metrics(probs: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray):
    """P/R/F1/acc at 25 Hz (3-frame pooled), thresholds 0.4 pred / 0.5 gt
    (reference :2436-2448)."""
    b, t, f = probs.shape
    t3 = (t // 3) * 3
    p3 = probs[:, :t3].reshape(b, t3 // 3, 3, f).mean(axis=2)
    g3 = gt[:, :t3].reshape(b, t3 // 3, 3, f).mean(axis=2)
    m3 = mask[:, :t3].reshape(b, t3 // 3, 3).astype(jnp.float32).mean(axis=2) >= 0.99
    m3 = m3[..., None]
    tp = jnp.sum(((p3 >= 0.4) & (g3 >= 0.5)) & m3)
    fp = jnp.sum(((p3 >= 0.4) & (g3 < 0.5)) & m3)
    fn = jnp.sum(((p3 < 0.4) & (g3 >= 0.5)) & m3)
    tp = tp.astype(jnp.float32)
    fp = fp.astype(jnp.float32)
    fn = fn.astype(jnp.float32)
    pre = jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1), 0.0)
    rec = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1), 0.0)
    f1 = jnp.where(2 * tp + fp + fn > 0, 2 * tp / jnp.maximum(2 * tp + fp + fn, 1), 0.0)
    acc = jnp.where(tp + fp + fn > 0, tp / jnp.maximum(tp + fp + fn, 1), 0.0)
    return pre, rec, f1, acc

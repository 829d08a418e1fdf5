"""End-to-end training orchestration: corpora -> batches -> device encoders ->
sharded train step -> eval/checkpoint loop.

The reference's ``E2Trainer.train`` (trainer_multigpus_alldatas3.py:326-452)
wired HF-Accelerate DataLoaders whose *workers* ran EnCodec/CLIP on CPU. Here
the host batcher ships raw waveforms/features and the frozen encoders run
jitted on device:

  host:   TrainBatcher (manifests, mixing, blacklists, 50% video-prompt flip)
  device: EnCodec encode (waveform -> latents), T5 contexts, CLIP features
          (disk-cached per video), CFM train step (+AllReduce via sharding)
  loop:   GradGuard non-finite protection, Watchdog heartbeat, periodic eval
          (deterministic val mode) + exact-state checkpoints (AutoResumer)
"""

from __future__ import annotations

import os

import numpy as np

from v2ap_tpu.config import V2APConfig


class TrainingPipeline:
    def __init__(self, cfg: V2APConfig | None = None, *, seed: int = 0,
                 work_dir: str = "runs/v2ap", tiny: bool = False,
                 t5_config=None, clip_config=None, encodec_config=None,
                 mesh=None):
        import jax
        from v2ap_tpu.pipelines.generate import V2APipeline
        from v2ap_tpu.training.trainer import Trainer
        from v2ap_tpu.training.resilience import AutoResumer, Watchdog
        from v2ap_tpu.utils.observability import MetricsLogger

        self.cfg = cfg or V2APConfig()
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)

        # the serving pipeline owns CFM + frozen encoders + jitted closures
        # training conditioning must stay in reference-parity numerics — the
        # int8-tower SERVING default never applies here (quantize.py)
        self.pipe = V2APipeline(self.cfg, seed=seed, t5_config=t5_config,
                                quantize_towers=False,
                                clip_config=clip_config,
                                encodec_config=encodec_config)
        # optional device mesh: shard the trained core with the DP(xTP)
        # rules and place each batch on the data axis — jit then inserts the
        # gradient AllReduce over ICI (SURVEY §5.8)
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from v2ap_tpu.parallel import batch_sharding, shard_model
            shard_model(self.pipe.cfm, mesh)
            self._batch_sharding = batch_sharding(mesh)
        self.trainer = Trainer(self.pipe.cfm, self.cfg.train)
        self.resumer = AutoResumer(self.trainer,
                                   os.path.join(work_dir, "ckpts"),
                                   save_every=self.cfg.train.save_step)
        self.watchdog = Watchdog(os.path.join(work_dir, "heartbeat.json"))
        self.metrics = MetricsLogger(os.path.join(work_dir, "logs"))
        self._rng = np.random.default_rng(seed)
        self._jax = jax

    # ------------------------------------------------------------- encoding
    def device_batch(self, batch) -> dict:
        """Host Batch -> jit-ready dict (latents, conditioning, masks)."""
        import jax.numpy as jnp

        mc = self.cfg.model
        wav = jnp.asarray(batch.waveforms)
        latents = self.pipe._encode_audio(self.pipe.codec, wav)
        b, n, _ = latents.shape

        text = np.zeros((b, n, mc.dim_text_raw or mc.dim_text), np.float32)
        frames = None
        midis = np.zeros((b, n, mc.notes), np.float32)
        for i, vp in enumerate(batch.video_paths):
            if vp is None:
                continue
            feats, _ = self.pipe.encode_video_frames_clip(vp, n)
            # video_drop_prompt only swaps the T5 prompt to "the sound of X X"
            # and zeroes the prompt context below; the CLIP video stream stays
            # active (reference trainer_multigpus_alldatas3.py:385-390 flips it
            # for 50% of video rows precisely to train video-only conditioning;
            # e2_tts_crossatt3.py:2052-2062 touches only prompt/context).
            if feats is not None:
                text[i, : len(feats)] = feats[:n]
            if batch.piano[i]:
                strips = self.pipe.encode_piano_frames(vp, n)
                if strips is not None:       # uint8 -> [0,1] for the trainer
                    rows = int(np.floor(n / mc.video_multi)) + 1
                    if frames is None:
                        frames = np.zeros((b, rows) + strips.shape[1:],
                                          np.float32)
                    frames[i, : len(strips)] = strips[:rows] / 255.0
                gt_path = vp.replace(".mp4", ".3.npy")
                if os.path.exists(gt_path):
                    gt = np.load(gt_path).astype(np.float32)[
                        :, mc.note_min: mc.note_max + 1]
                    midis[i, : len(gt)] = gt[:n]

        prompts = ["the sound of X X" if batch.video_drop_prompt[i]
                   else (c or "") for i, c in enumerate(batch.captions)]
        ctx, ctx_mask = self.pipe.encode_text(prompts)
        ctx = jnp.where(
            jnp.asarray(batch.video_drop_prompt)[:, None, None], 0.0, ctx)

        out = {
            "latents": latents,
            "lens": jnp.asarray(batch.lens),
            "text_embed": jnp.asarray(text),
            "context": ctx,
            "context_mask": ctx_mask,
            "midis": jnp.asarray(midis),
        }
        if frames is not None:
            out["frames"] = jnp.asarray(frames)
        if self._batch_sharding is not None:
            out = {k: self._jax.device_put(v, self._batch_sharding)
                   for k, v in out.items()}
        return out

    # ----------------------------------------------------------------- loop
    def fit(self, batcher, *, num_steps: int, eval_batcher=None,
            log_every: int = 20, seed: int = 0) -> int:
        import jax

        start = self.resumer.maybe_resume()
        rng = jax.random.key(seed + start)
        it = iter(batcher)
        eval_it = iter(eval_batcher) if eval_batcher is not None else None
        for _ in range(start, num_steps):
            batch = self.device_batch(next(it))
            rng, sub = jax.random.split(rng)
            loss, breakdown = self.trainer.train_step(sub, batch)
            step = self.trainer.step
            if step % log_every == 0:
                scalars = dict(loss=float(loss), flow=float(breakdown.flow),
                               midi=float(breakdown.midi))
                if self.cfg.train.dpo:
                    scalars["dpo"] = float(breakdown.dpo)
                if self.cfg.train.contrastive:
                    scalars["contrastive"] = float(breakdown.contrastive)
                self.metrics.log(step, **scalars)
                self.watchdog.beat(step, loss=float(loss))
            se = self.cfg.train.switch_ema_every
            if se and step % se == 0 and self.trainer.ema is not None:
                self.trainer.switch_ema()
            if self.resumer.maybe_save() and eval_it is not None:
                # periodic val loss/F1 + latent-spectrogram figures, matching
                # the reference's every-save_step evaluate() + TB mel dumps
                # (trainer_multigpus_alldatas3.py:434-439)
                eb = self.device_batch(next(eval_it))
                eloss, ebk, pred = self.trainer.eval_step(
                    jax.random.key(0), eb, return_pred=True)
                self.metrics.log(step, val_loss=float(eloss),
                                 val_f1=float(ebk.f1))
                self.metrics.log_spectrogram(step, "target", eb["latents"][0])
                self.metrics.log_spectrogram(step, "pred", pred[0])
        return self.trainer.step

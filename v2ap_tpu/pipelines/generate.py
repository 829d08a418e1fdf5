"""End-to-end video-to-audio / video-to-piano generation pipeline.

The serving path of the reference (`run()` in app.py:211-298 / predict.py:
210-297, SURVEY §3.1), re-built TPU-first:

  host: video decode (cv2) -> CLIP preprocessing -> piano strips    [CPU]
  device: CLIP tower (chunked batches, one jit)                     [TPU]
  device: 25-step sway-Euler CFM sampling, CFG batch-doubled,
          piano Video2Roll branch inside the jitted sampler         [TPU]
  device: EnCodec decode                                            [TPU]
  host: wav write + (optional) ffmpeg mux                           [CPU]

All device stages are jitted once per shape bucket (latent lengths bucket to
multiples of 96 so total length with 32 registers tiles onto the Pallas
flash-attention kernel).
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from v2ap_tpu.config import V2APConfig, SamplerConfig


def bucket_length(n: int, bucket: int = 96) -> int:
    """Round up so (length + 32 registers) divides into flash-kernel blocks."""
    return max(bucket, ((n + bucket - 1) // bucket) * bucket)


class FallbackTokenizer:
    """Deterministic hash tokenizer used when the sentencepiece T5 tokenizer
    assets are unavailable (zero-egress environments); ids are stable across
    processes so cached prompts stay valid."""

    def __init__(self, vocab_size: int, max_len: int = 64):
        self.vocab_size = vocab_size
        self.max_len = max_len

    def __call__(self, prompts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        b = len(prompts)
        ids = np.zeros((b, self.max_len), np.int32)
        mask = np.zeros((b, self.max_len), np.int32)
        for i, p in enumerate(prompts):
            words = p.split()[: self.max_len - 1]
            for j, w in enumerate(words):
                h = int(hashlib.md5(w.lower().encode()).hexdigest(), 16)
                ids[i, j] = h % (self.vocab_size - 2) + 1
            ids[i, len(words)] = 1            # eos
            mask[i, : len(words) + 1] = 1
        return ids, mask


def load_t5_tokenizer(path: Optional[str], vocab_size: int):
    path = path or os.environ.get("V2AP_T5_TOKENIZER")
    if path and os.path.exists(path):
        from transformers import AutoTokenizer
        tok = AutoTokenizer.from_pretrained(path)

        def encode(prompts):
            batch = tok(list(prompts), padding=True, truncation=True,
                        max_length=tok.model_max_length, return_tensors="np")
            return batch["input_ids"].astype(np.int32), \
                batch["attention_mask"].astype(np.int32)

        return encode
    return FallbackTokenizer(vocab_size)


class V2APipeline:
    """Owns the model stack + jitted device programs."""

    def __init__(self, cfg: V2APConfig | None = None, *, seed: int = 0,
                 tokenizer_path: Optional[str] = None,
                 t5_config=None, clip_config=None, encodec_config=None,
                 tower_configs: Optional[dict] = None,
                 quantize_towers: Optional[bool] = None,
                 quantize_cfm: Optional[bool] = None):
        import jax
        import jax.numpy as jnp
        from flax import nnx
        from v2ap_tpu.models.cfm import CFM
        from v2ap_tpu.models.encodec import EncodecModel
        from v2ap_tpu.models.t5 import T5Encoder, flan_t5_large
        from v2ap_tpu.models.video_towers import build_video_towers
        from v2ap_tpu.utils.jitting import create_model, model_rngs

        self.cfg = cfg or V2APConfig()
        self._jnp = jnp
        self._nnx = nnx
        self._jax = jax

        self.t5_cfg = t5_config or flan_t5_large()
        tower_configs = dict(tower_configs or {})
        if clip_config is not None:                # back-compat shorthand
            tower_configs.setdefault("clip_vit", clip_config)
        if encodec_config is None:
            from v2ap_tpu.models.encodec import EncodecConfig
            encodec_config = EncodecConfig()
            if self.cfg.model.num_channels != encodec_config.hidden_size:
                # miniature configs: shrink the codec to the latent width
                import dataclasses as _dc
                encodec_config = _dc.replace(
                    encodec_config, hidden_size=self.cfg.model.num_channels,
                    num_filters=4, upsampling_ratios=(8, 5, 4, 2),
                    num_lstm_layers=1)
        self.codec_cfg = encodec_config

        # model_rngs: dropout stream may ride the hardware RNG for training
        # (V2AP_RBG_DROPOUT; serving never draws dropout, so this is inert
        # at inference either way)
        self.cfm = create_model(lambda: CFM(
            self.cfg.model, self.cfg.conditioning,
            with_video2roll=self.cfg.model.video2roll, rngs=model_rngs(seed)))
        self.codec = create_model(lambda: EncodecModel(self.codec_cfg,
                                                       rngs=nnx.Rngs(seed + 1)))
        self.t5 = create_model(lambda: T5Encoder(self.t5_cfg,
                                                 rngs=nnx.Rngs(seed + 2)))
        self.towers = build_video_towers(
            self.cfg.conditioning.video_encoder, seed=seed + 3,
            overrides=tower_configs)
        self.video_embed_dim = sum(t.embed_dim for t in self.towers)
        # back-compat aliases (single-tower configs)
        self.clip = self.towers[0].model
        self.clip_cfg = self.towers[0].model.cfg
        # frozen encoders live in bf16 on device (memory: bigG ~7 GB in f32)
        if jnp.dtype(self.cfg.model.dtype) == jnp.bfloat16:
            from v2ap_tpu.utils.jitting import cast_params
            cast_params(self.t5, jnp.bfloat16)
            for tower in self.towers:
                cast_params(tower.model, jnp.bfloat16)
        # int8 matmuls for the frozen vision towers — the SERVING DEFAULT
        # (V2AP_INT8_TOWERS=0 restores bf16 reference-parity mode). int8 runs
        # the MXU at ~2x the bf16 rate on v5e and the towers dominate cold
        # end-to-end serving. Quality bound (scripts/probe_tower_drift.py,
        # per-channel AbsMax DRQ on bigG): conditioning features drift 2.95%
        # rel-rms vs f32 — about 2x the 1.39% drift the bf16 compute dtype
        # (the uncontested previous default) already incurs. Training, eval
        # and the parity tests never quantize; end-audio impact should be
        # re-validated once real checkpoints are converted (PARITY.md).
        if quantize_towers is None:
            env = os.environ.get("V2AP_INT8_TOWERS")
            if env is not None:
                quantize_towers = env != "0"
            else:
                # pre-registered end-audio quality gate: once real weights
                # exist, scripts/int8_tower_gate.py A/Bs int8 vs bf16 towers
                # through FAD and persists the verdict — a failing bound
                # flips this default automatically (evaluation/int8_gate.py)
                from v2ap_tpu.evaluation.int8_gate import read_gate_default
                gate = read_gate_default()
                quantize_towers = True if gate is None else gate
        if quantize_towers:
            try:
                from v2ap_tpu.utils.quantize import quantize_linears_int8
                for tower in self.towers:
                    quantize_linears_int8(tower.model)
            except ImportError:            # AQT not installed: bf16 fallback
                import warnings
                warnings.warn("aqt not installed — towers stay bf16 "
                              "(reference-parity mode)")
                quantize_towers = False
        # cache tags: a mode switch (int8 <-> bf16) must not serve feature
        # caches written under the other numerics
        self._tower_tag = "int8" if quantize_towers else "bf16"
        # opt-in int8 matmuls for the CFM core itself (env V2AP_INT8_CFM=1):
        # measured ~13% faster 25-step sampling on v5e (17.7x -> 20.0x sans
        # decode) but sampled latents shift ~1.6% rms relative vs bf16, so
        # this stays off by default — serving numerics match training/eval.
        # Weight storage is untouched (AQT dynamic-range quantizes inside the
        # op), so load_weights() after construction still works.
        if quantize_cfm is None:
            quantize_cfm = os.environ.get("V2AP_INT8_CFM", "0") == "1"
        if quantize_cfm:
            from v2ap_tpu.utils.quantize import quantize_linears_int8
            quantize_linears_int8(self.cfm)
        self._roll_tag = "int8" if quantize_cfm else "bf16"

        self.tokenize = load_t5_tokenizer(tokenizer_path, self.t5_cfg.vocab_size)
        self._stage_timings: dict = {}     # per-call host-stage breakdown
        self._mesh = None                  # set by shard_serving()
        self._frame_sharding = None

        self._t5_fwd = nnx.jit(lambda m, ids, mask: m(ids, mask))
        self._clip_fwd = nnx.jit(lambda m, px: m(px))
        # serving path: pixels arrive uint8 (4x less tunnel/PCIe traffic than
        # f32) and normalise on device before the tower
        from v2ap_tpu.models.clip_vit import device_normalize, unpack_yuv420
        self._tower_fwd = nnx.jit(
            lambda m, px, mean, std: m(device_normalize(px, mean, std)))
        # YUV 4:2:0 pixel shipping (V2AP_SHIP_YUV420=1): halves the
        # host->device frame transfer on tunneled hosts; the source video is
        # h264 4:2:0 so the chroma re-subsample adds only a small resample
        # error (see scripts/probe_yuv_drift.py for the measured feature
        # drift). RGB reconstruction happens inside the jitted tower.
        self._tower_fwd_yuv = nnx.jit(
            lambda m, y, uv, mean, std: m(unpack_yuv420(y, uv, mean, std)))
        # Default ON only behind the axon tunnel, where the wire (~35 MB/s)
        # is the bottleneck the halved transfer attacks (+6% cold RTF
        # measured, scripts/probe_serving_variants.py); on directly-attached
        # hosts the PCIe copy is ~10 ms and the host-side pack would be a
        # net loss. Feature drift on video-like content: 0.79% rel-rms
        # (probe_yuv_drift.py) — under the bf16 compute dtype's 1.39%.
        env = os.environ.get("V2AP_SHIP_YUV420")
        if env is not None:
            self._ship_yuv420 = env == "1"
        else:
            try:
                # the axon plugin registers under its own backend key but its
                # devices report platform "tpu", so default_backend() never
                # says "axon" (that check silently left yuv off everywhere —
                # caught by probe_composite_drift's modes field in r5)
                from jax._src import xla_bridge as _xb
                self._ship_yuv420 = "axon" in _xb.backends()
            except Exception:
                self._ship_yuv420 = False
        if self._ship_yuv420:     # caches written under one pixel path must
            self._tower_tag += "+yuv420"   # not serve the other
        # Conditioning frame-subsample (cold-serving lever): encode every Nth
        # decoded frame through the vision tower and linearly interpolate
        # features between the encoded anchors. The tower pass dominates cold
        # end-to-end serving, so stride N cuts its device time ~N-fold.
        # Stride 1 = reference parity (every frame, nearest-frame interp,
        # e2_tts_crossatt3.py:1800-1813). Feature drift of the interpolated
        # conditioning is bounded by scripts/probe_subsample_drift.py.
        env = os.environ.get("V2AP_FRAME_STRIDE")
        self._frame_stride = max(1, int(env) if env
                                 else self.cfg.conditioning.frame_stride)
        if self._frame_stride > 1:         # stride changes the cached features
            self._tower_tag += f"+s{self._frame_stride}"
        self._decode = nnx.jit(lambda m, lat: m.decode(lat))
        self._encode_audio = nnx.jit(lambda m, wav: m.encode(wav))
        self._sample = nnx.jit(
            lambda m, x0, text, frames_roll, ctx, ctx_mask, mask, sampler:
                m.sample(x0, text_embed=text, frames_embed=frames_roll,
                         context=ctx, context_mask=ctx_mask, mask=mask,
                         sampler=sampler),
            static_argnames="sampler")
        self._sample_multipass = nnx.jit(
            lambda m, x0, text, frames_roll, ctx, ctx_mask, mask, sampler,
                   rng, passes, restart_t:
                m.sample_multipass(x0, rng=rng, passes=passes,
                                   restart_t=restart_t, text_embed=text,
                                   frames_embed=frames_roll, context=ctx,
                                   context_mask=ctx_mask, mask=mask,
                                   sampler=sampler),
            static_argnames=("sampler", "passes", "restart_t"))
        self._encode_frames = nnx.jit(
            lambda m, frames, n: m.encode_frames(
                frames.astype(jnp.float32) / 255.0
                if jnp.issubdtype(frames.dtype, jnp.integer) else frames, n),
            static_argnames="n")
        # 2:1 strip shipping (V2AP_SHIP_STRIP_HALF=1): keyboard strips pack
        # to uint8 pair-means on host (~42 ms) and linearly upsample back
        # inside the jitted Video2Roll call — halves the ~21 MB V2P strip
        # upload. OPT-IN, measured a net loss on this tunneled host
        # (interleaved medians 3.52 vs 3.81 rtf, scripts/probe_strip_half.py
        # --timing): the strip upload is dispatched early and fully overlaps
        # the tower pass here, so shrinking it buys nothing while the pack
        # sits on the critical path. Kept for wire-bound hosts where the
        # upload does NOT overlap. Roll drift: 0.09% rel-rms on smooth
        # content, 3.2% on worst-case noise.
        from v2ap_tpu.models.video2roll import upsample_strips_2x
        self._encode_frames_half = nnx.jit(
            lambda m, half, n: m.encode_frames(
                upsample_strips_2x(half.astype(jnp.float32) / 255.0), n),
            static_argnames="n")
        self._ship_strip_half = os.environ.get(
            "V2AP_SHIP_STRIP_HALF", "0") == "1"
        if self._ship_strip_half:   # packed-path rolls must not share caches
            self._roll_tag += "+shalf"
        # Strided keyboard strips (cold V2P lever, r4): the fused decoder
        # grab()-skips between every Nth strip — the full-rate strip decode
        # (~2/3 of cold V2P host wall) and the ~21 MB strip upload both
        # shrink N-fold — and the device lerps rolls between the strided
        # anchors (interp_weights_piano + gather inside the jitted
        # Video2Roll call). Unlike the strip-half pack this REMOVES host
        # work from the critical path instead of adding it. Stride 1 =
        # reference parity; drift bounds: scripts/probe_strip_stride.py.
        env = os.environ.get("V2AP_STRIP_STRIDE")
        self._strip_stride = max(1, int(env) if env
                                 else self.cfg.conditioning.strip_stride)
        if self._ship_strip_half:       # mutually exclusive wire levers
            self._strip_stride = 1
        if self._strip_stride > 1:      # lerped rolls must not share caches
            self._roll_tag += f"+ss{self._strip_stride}"
        self._encode_frames_strided = nnx.jit(
            lambda m, strips, i0, i1, w, n: m.encode_frames(
                (strips.astype(jnp.float32)[:, i0]
                 * (1.0 - w)[None, :, None, None]
                 + strips.astype(jnp.float32)[:, i1]
                 * w[None, :, None, None]) / 255.0, n),
            static_argnames="n")

    # ------------------------------------------------------------------ io
    def load_weights(self, ckpt_dir: str) -> list:
        """Load converted checkpoints (scripts/convert_checkpoints.py layout:
        subdirs cfm/ encodec/ t5/ clip/ — whichever exist). Returns the list
        of components loaded."""
        import os
        from v2ap_tpu.utils.checkpoint import load_model
        pairs = [("cfm", self.cfm), ("encodec", self.codec),
                 ("t5", self.t5), ("clip", self.clip)]
        pairs += [(t.name, t.model) for t in self.towers]
        loaded = []
        seen = set()
        for name, model in pairs:
            path = os.path.join(ckpt_dir, name)
            if os.path.isdir(path) and path not in seen:
                seen.add(path)
                load_model(path, model)
                loaded.append(name)
        if not loaded and os.path.isdir(ckpt_dir):
            load_model(ckpt_dir, self.cfm)     # bare CFM checkpoint dir
            loaded.append("cfm")
        return loaded

    # ------------------------------------------------------------ conditioning
    def shard_serving(self, mesh) -> None:
        """Distribute single-clip serving across a device mesh: all model
        params spread with the framework's DP+TP sharding rules
        (`parallel.shard_model` — big weights shard over the `model` axis)
        and the per-frame tower batches shard over the `data` axis, so the
        CLIP per-frame pass — the end-to-end serving bottleneck — runs
        N-way data-parallel on a pod slice. Single-chip behavior unchanged
        when never called."""
        from v2ap_tpu.parallel.mesh import batch_sharding
        from v2ap_tpu.parallel.sharding import shard_model

        for tower in self.towers:
            shard_model(tower.model, mesh)
        shard_model(self.t5, mesh)
        shard_model(self.cfm, mesh)
        shard_model(self.codec, mesh)
        self._mesh = mesh
        self._frame_sharding = batch_sharding(mesh)

    def encode_text(self, prompts: Sequence[str]):
        ids, mask = self.tokenize(list(prompts))
        ctx = self._t5_fwd(self.t5, self._jnp.asarray(ids),
                           self._jnp.asarray(mask))
        return ctx, self._jnp.asarray(mask, bool)

    def _encode_tower(self, tower, video_path: str, chunk: int,
                      frames_cache: list):
        """One tower's per-frame embeddings with its own on-disk npz cache
        (the reference keeps per-encoder feature dirs, :1747-1783)."""
        from v2ap_tpu.data import video_io

        import os as _os

        cache = video_io.clip_feature_cache_path(video_path, tower.name)
        if self.cfg.conditioning.feature_cache:
            feats, duration = video_io.load_feature_cache(
                cache, tag=self._tower_tag)
            if feats is not None:
                return feats, duration
        mean = self._jnp.asarray(tower.mean, self._jnp.float32)
        std = self._jnp.asarray(tower.std, self._jnp.float32)
        dp = 1
        if self._mesh is not None:                    # frame batch shards
            dp = self._mesh.shape[self._mesh.axis_names[0]]
            chunk = ((chunk + dp - 1) // dp) * dp

        ship_yuv = (self._ship_yuv420
                    and self._frame_sharding is None)   # pod path ships RGB

        def tail_bucket(n: int) -> int:
            """Smallest of {chunk/4, chunk/2, chunk} that fits the tail —
            a fixed chunk pads the last dispatch up to a full chunk, wasting
            up to chunk-1 frames of tower compute (38% of the whole pass on
            the 79-frame stride-3 bench clip). Three bucket sizes bound the
            waste at chunk/4-1 while compiling each tower program once."""
            for b in (max(chunk // 4, 1), max(chunk // 2, 1), chunk):
                b = ((b + dp - 1) // dp) * dp
                if n <= b:
                    return b
            return chunk

        def dispatch(part, target):
            real = len(part)
            if real < target:
                part = np.concatenate(
                    [part,
                     np.zeros((target - real,) + part.shape[1:], part.dtype)])
            if ship_yuv:
                from v2ap_tpu.models.clip_vit import pack_yuv420
                y, uv = pack_yuv420(part)
                return real, self._tower_fwd_yuv(
                    tower.model, self._jnp.asarray(y), self._jnp.asarray(uv),
                    mean, std)
            dev = (self._jax.device_put(part, self._frame_sharding)
                   if self._frame_sharding is not None
                   else self._jnp.asarray(part))
            return real, self._tower_fwd(tower.model, dev, mean, std)

        # dispatch every chunk before collecting any result: jax dispatch is
        # async, so uploads and tower compute overlap instead of serialising
        # on one host round-trip per chunk
        pending = []
        stride = self._frame_stride
        stream = (_os.environ.get("V2AP_STREAM_DECODE", "0") == "1"
                  and not frames_cache and len(self.towers) == 1
                  and stride == 1)   # chunked decode can't keep stride phase
        if stream:
            # chunk-pipelined: decode + preprocess chunk k on the host while
            # the device runs the tower on chunk k-1 (opt-in; on 1-core
            # tunneled hosts the RPC threads contend with the decoder)
            reader = video_io.VideoChunkReader(video_path, chunk)
            for frames_chunk in reader:
                pending.append(dispatch(tower.preprocess(frames_chunk),
                                        tail_bucket(len(frames_chunk))))
            duration = reader.duration
            if reader.failed or not pending:   # same outcome as the default
                return None, None              # path's decode failure
        else:
            import time as _time
            if not frames_cache:
                # towers only need every stride-th frame: decode with
                # grab()-skip (video_io.read_video_frames step) — measured 7x
                # faster at stride 3 on the bench clip. The cache entry
                # records its step so a full-rate consumer (piano strips)
                # never silently reads subsampled frames.
                _t = _time.perf_counter()
                frames_, dur_ = video_io.read_video_frames(video_path,
                                                           step=stride)
                frames_cache.append((frames_, dur_, stride))
                self._stage_timings["decode_s"] = (
                    self._stage_timings.get("decode_s", 0.0)
                    + _time.perf_counter() - _t)
            frames, duration, cached_step = frames_cache[0]
            if frames is None:
                return None, None
            assert cached_step in (1, stride), (cached_step, stride)
            _t = _time.perf_counter()
            if stride > 1 and cached_step == 1:
                frames = frames[::stride]
            px = tower.preprocess(frames)             # uint8 geometry only
            self._stage_timings["preprocess_s"] = (
                self._stage_timings.get("preprocess_s", 0.0)
                + _time.perf_counter() - _t)
            for i in range(0, len(px), chunk):
                part = px[i: i + chunk]
                pending.append(dispatch(part, tail_bucket(len(part))))
        # padding only ever sits at the end of the LAST part, so the global
        # slice after one device-side concat drops exactly the pad rows
        n_frames = sum(real for real, _ in pending)
        feats = self._jnp.concatenate([out for _, out in pending])[:n_frames]
        if self.cfg.conditioning.feature_cache:
            feats = np.asarray(feats)       # cache format unchanged (npz)
            video_io.save_feature_cache(cache, feats, duration,
                                        tag=self._tower_tag)
        return feats, duration

    def encode_video_frames_clip(self, video_path: str, length: int,
                                 chunk: Optional[int] = None,
                                 frames_cache=None):
        """Per-frame embeddings from the configured video tower(s),
        interpolated to the latent rate, with the reference's on-disk npz
        cache (e2_tts_crossatt3.py:1679-1813). In "mixed" mode the four
        towers' embeddings concatenate per frame (1280+768+1024+1536=4608,
        reference :1786-1789)."""
        from v2ap_tpu.data import video_io

        if chunk is None:     # 64 won the r3 ablation; env knob for re-probes
            chunk = int(os.environ.get("V2AP_TOWER_CHUNK", "64"))
        frames_cache = [] if frames_cache is None else frames_cache
        per_tower = []
        duration = None
        for tower in self.towers:
            feats, duration = self._encode_tower(tower, video_path, chunk,
                                                 frames_cache)
            if feats is None:
                return None, None
            per_tower.append(feats)
        jnp = self._jnp
        on_device = any(not isinstance(f, np.ndarray) for f in per_tower)
        xp = jnp if on_device else np
        t = min(len(f) for f in per_tower)
        feats = (per_tower[0][:t] if len(per_tower) == 1 else
                 xp.concatenate([xp.asarray(f[:t]) for f in per_tower],
                                axis=-1))
        # nearest-frame interpolation to the latent rate: host-computed index
        # table, gather on device when the embeddings stayed there (cold
        # serving keeps the whole conditioning path on-chip — no ~12 MB
        # feature round trip over the host link)
        if self._frame_stride > 1:
            # subsampled anchors: linear blend between the two nearest encoded
            # frames recovers most of the skipped frames' information (probe:
            # scripts/probe_subsample_drift.py; nearest would alias)
            i0, i1, w = video_io.interp_weights_clip(
                t, duration, length,
                sample_rate=self.cfg.conditioning.sampling_rate,
                frame_size=self.cfg.conditioning.frame_size)
            wcol = xp.asarray(w)[:, None]
            interp = feats[i0] * (1.0 - wcol) + feats[i1] * wcol
        else:
            idx = video_io.interp_indices_clip(
                t, duration, length,
                sample_rate=self.cfg.conditioning.sampling_rate,
                frame_size=self.cfg.conditioning.frame_size)
            interp = feats[idx]
        if len(interp) < length:
            interp = xp.concatenate(
                [interp, xp.zeros((length - len(interp), interp.shape[-1]),
                                  interp.dtype)])
        return interp.astype(xp.float32), duration

    def encode_piano_frames(self, video_path: str, length: int,
                            frames_cache=None, strips_cache=None):
        """Grayscale keyboard strips resampled to the roll rate, cached
        (e2_tts_crossatt3.py:1888-1943). ``frames_cache`` shares one video
        decode with the CLIP tower pass; ``strips_cache`` accepts source-rate
        strips already produced by the fused decode
        (video_io.read_video_frames_and_strips)."""
        from v2ap_tpu.data import video_io

        cache = video_io.piano_frames_cache_path(video_path)
        strips, duration = (video_io.load_feature_cache(cache)
                            if self.cfg.conditioning.feature_cache else (None, None))
        if strips is None and strips_cache:
            strips, duration = strips_cache[0]
            if strips is not None and self.cfg.conditioning.feature_cache:
                video_io.save_feature_cache(cache, strips, duration)
        if strips is None:
            frames = None
            if frames_cache:
                frames, duration, cached_step = frames_cache[0]
                if cached_step != 1:     # tower decoded strided: strips need
                    frames = None        # the full frame rate — decode fresh
            if frames is None:
                frames, duration = video_io.read_video_frames(video_path)
                if frames_cache is not None and not frames_cache:
                    frames_cache.append((frames, duration, 1))
            if frames is None:
                return None
            strips = video_io.piano_preprocess(
                frames, self.cfg.conditioning.piano_frame_w,
                self.cfg.conditioning.piano_frame_h)
            if self.cfg.conditioning.feature_cache:
                video_io.save_feature_cache(cache, strips, duration)
        if strips.ndim == 4:                 # cache stores (t, h, w, 1)
            strips = strips[..., 0]
        if strips.dtype != np.uint8:         # legacy float caches
            strips = np.clip(strips * 255.0, 0, 255).round().astype(np.uint8)
        idx = video_io.interp_indices_piano(
            len(strips), duration, length,
            video_multi=self.cfg.model.video_multi,
            sample_rate=self.cfg.conditioning.sampling_rate,
            frame_size=self.cfg.conditioning.frame_size)
        return strips[idx]                   # uint8; /255 happens on device

    def _ship_strips(self, strips: np.ndarray):
        """Dispatch the (async) host->device keyboard-strip upload, packed
        2:1 when the strip-half shipping mode is on."""
        if self._ship_strip_half:
            from v2ap_tpu.data.video_io import pack_strips_half
            strips = pack_strips_half(strips)
        return self._jnp.asarray(strips[None])

    def _strided_strip_plan(self, strips_src: np.ndarray, n_src: int,
                            duration: float, length: int):
        """Ship ``strip_stride``-strided strips + their device-lerp plan.
        Returns the tuple `_roll_from_strips` expects. Rows pad to a
        32-bucket (edge repeat; the plan never indexes pad rows) so the
        tunnel sees stable array shapes across clips."""
        from v2ap_tpu.data import video_io
        i0, i1, w = video_io.interp_weights_piano(
            n_src, duration, length, self._strip_stride,
            video_multi=self.cfg.model.video_multi,
            sample_rate=self.cfg.conditioning.sampling_rate,
            frame_size=self.cfg.conditioning.frame_size)
        pad = (-len(strips_src)) % 32
        if pad:
            strips_src = np.concatenate(
                [strips_src, np.repeat(strips_src[-1:], pad, axis=0)])
        jnp = self._jnp
        return (jnp.asarray(strips_src[None]), jnp.asarray(i0),
                jnp.asarray(i1), jnp.asarray(w))

    def _roll_from_strips(self, strips_dev, n: int):
        """Video2Roll probabilities from an uploaded strip batch (strided
        plan tuple, packed, or exact — matching the shipping mode)."""
        if isinstance(strips_dev, tuple):
            strips, i0, i1, w = strips_dev
            return self._encode_frames_strided(self.cfm, strips, i0, i1, w, n)
        fn = (self._encode_frames_half if self._ship_strip_half
              else self._encode_frames)
        return fn(self.cfm, strips_dev, n)

    # ---------------------------------------------------------------- generate
    def generate(
        self,
        video_path: Optional[str],
        prompt: str = "",
        *,
        duration_s: Optional[float] = None,
        steps: int = 25,
        cfg_strength: float = 2.0,
        piano: bool = False,
        seed: int = 0,
        max_duration_s: float = 30.0,
        passes: int = 1,
        restart_t: float = 0.6,
        fewstep: Optional[int] = None,
    ) -> Tuple[np.ndarray, int]:
        """Silent video (+ optional prompt) -> generated waveform @ 24 kHz.

        Serving-parity semantics: empty prompt becomes the video-drop filler
        "the sound of X X" with zeroed T5 context (e2_tts_crossatt3.py:
        2053-2062); piano mode feeds keyboard strips through Video2Roll.

        ``fewstep=N`` selects the reflow-distilled few-step serving mode:
        N uniform Euler steps with NO CFG (guidance is baked into the
        distilled weights; training/distill.py). Load the student checkpoint
        via ``load_weights`` first — with teacher weights this mode trades
        quality for ~25*2/N fewer transformer evals."""
        import time as _time
        jnp = self._jnp
        cond = self.cfg.conditioning
        sr = cond.sampling_rate
        timings = {}
        self._stage_timings = {}
        _t0 = _time.perf_counter()

        def plan_length(dur_s):
            """(duration_s, n_valid, n): bucketed latent length under the
            abs-pos ceiling (seq + registers must fit max_seq_len)."""
            max_n = ((self.cfg.model.max_seq_len
                      - self.cfg.model.num_registers) // 96) * 96
            nv = min(int(round(dur_s * sr / cond.frame_size)), max_n)
            return (min(dur_s, nv * cond.frame_size / sr), nv,
                    min(bucket_length(nv), max_n))

        text_embed_np, video_duration = (None, None)
        n = None
        decoded = []                      # one decode shared across encoders
        strips_dev = None
        roll_np = None
        roll_cache_write = None           # (path, duration): write after wav
        if piano and video_path is not None and duration_s is None:
            # piano path: decode first and dispatch the keyboard-strip upload
            # *before* the CLIP pass, so the ~20 MB uint8 transfer rides the
            # wire while the host does CLIP preprocessing and the device runs
            # the vision tower (jax transfers are async)
            from v2ap_tpu.data import video_io
            if self.cfg.conditioning.feature_cache:
                # roll-level cache: skips strip load/upload AND Video2Roll
                roll_np, roll_dur = video_io.load_feature_cache(
                    video_io.piano_roll_cache_path(video_path),
                    tag=self._roll_tag)
                if roll_np is not None:
                    duration_s, n_valid, n = plan_length(
                        min(roll_dur, max_duration_s))
                    if len(roll_np) != n:     # different length bucket
                        roll_np = None
                        duration_s = n = None
            cache = video_io.piano_frames_cache_path(video_path)
            # strided mode (_strip_stride > 1) never reads the full-rate
            # strip cache — honoring it here would route a warm rerun down
            # the EXACT-roll path while writing the result under the
            # '+ssN'-tagged roll cache, so the same tag could hold exact or
            # lerped numerics depending on cache history
            has_strip_cache = (self._strip_stride == 1
                               and self.cfg.conditioning.feature_cache
                               and video_io.load_feature_cache(cache)[0] is not None)
            if roll_np is None and not has_strip_cache:
                # fused decode: full-rate grayscale strips + RGB at the tower
                # stride in ONE pass over the codec output (the old shape —
                # full-rate decode, then a second gray+resize pass over a
                # 162 MB RGB array — dominated cold V2P host time)
                _t = _time.perf_counter()
                ss = self._strip_stride
                rgb, strips_src, dur, n_src = \
                    video_io.read_video_frames_and_strips(
                        video_path, step=self._frame_stride,
                        width=cond.piano_frame_w, height=cond.piano_frame_h,
                        strip_step=ss)
                self._stage_timings["decode_s"] = _time.perf_counter() - _t
                if rgb is not None:
                    decoded.append((rgb, dur, self._frame_stride))
                    dur0 = min(dur or 10.0, max_duration_s)
                    duration_s, n_valid, n = plan_length(dur0)
                    if ss > 1:
                        # strided strips never hit the full-rate strip cache;
                        # the (tagged) roll cache still covers warm serving
                        strips_dev = self._strided_strip_plan(
                            strips_src, n_src, dur, n)
                    else:
                        strips = self.encode_piano_frames(
                            video_path, n, frames_cache=decoded,
                            strips_cache=[(strips_src, dur)])
                        if strips is not None:
                            # async host->device transfer starts here and
                            # overlaps the CLIP preprocessing + tower pass
                            strips_dev = self._ship_strips(strips)
        if video_path is not None:
            probe_len = int(max_duration_s * sr / cond.frame_size)
            text_embed_np, video_duration = self.encode_video_frames_clip(
                video_path, probe_len, frames_cache=decoded)
            if (os.environ.get("V2AP_STAGE_SYNC") == "1"
                    and text_embed_np is not None
                    and not isinstance(text_embed_np, np.ndarray)):
                # profiling-only drain: on axon, block_until_ready is a no-op
                # and the tower compute would otherwise drain inside the
                # sample_decode stage, mis-attributing device time. A tiny
                # host fetch forces the producing program to finish. Never on
                # by default — it serialises tower drain against the sampler
                # dispatch and costs real wall-clock.
                np.asarray(text_embed_np[:1, :1])
        timings["video_encode_s"] = _time.perf_counter() - _t0
        timings.update(self._stage_timings)   # host decode/preprocess split
        _t0 = _time.perf_counter()
        if duration_s is None:
            duration_s, n_valid, n = plan_length(
                min(video_duration or 10.0, max_duration_s))
        elif n is None:
            duration_s, n_valid, n = plan_length(duration_s)

        b = 1
        # mixed mode: raw concat width; CFM.proj_text projects to dim_text
        tdim = self.cfg.model.dim_text_raw or self.cfg.model.dim_text
        if text_embed_np is not None:
            m = min(n, len(text_embed_np))
            if isinstance(text_embed_np, np.ndarray):
                text = np.zeros((b, n, tdim), np.float32)
                text[0, :m] = text_embed_np[:m]
                text = jnp.asarray(text)
            else:                     # cold path: embeddings stayed on device
                text = jnp.zeros((b, n, tdim), jnp.float32
                                 ).at[0, :m].set(text_embed_np[:m])
        else:
            text = jnp.zeros((b, n, tdim), jnp.float32)

        drop_prompt = prompt.strip() == ""
        if drop_prompt:
            # reference semantics: swap to "the sound of X X" then zero the
            # encoded context (e2_tts_crossatt3.py:2053-2062). The T5 k/v
            # projections carry no bias, so a zero context of any length is
            # bit-identical to the zeroed T5 output — skip the T5 pass.
            ctx = jnp.zeros((b, 1, self.cfg.model.dim_context), jnp.float32)
            ctx_mask = jnp.ones((b, 1), bool)
        else:
            ctx, ctx_mask = self.encode_text([prompt])

        if piano and video_path is not None:
            if roll_np is not None and len(roll_np) == n:  # roll-cache hit
                frames_roll = jnp.asarray(roll_np[None])
            else:
                if strips_dev is None:    # cached-strip / explicit-duration path
                    strips = self.encode_piano_frames(video_path, n,
                                                      frames_cache=decoded)
                    if strips is not None:
                        strips_dev = self._ship_strips(strips)
                if strips_dev is not None:
                    frames_roll = self._roll_from_strips(strips_dev, n)
                    if self.cfg.conditioning.feature_cache:
                        # deferred until after the wav fetch: np.asarray here
                        # would block the host on the whole tower+Video2Roll
                        # drain BEFORE the sampler is even dispatched.
                        # Tag by the path that PRODUCED the roll: the exact
                        # (non-strided-plan) path can run even when
                        # _strip_stride > 1 (explicit duration_s), and its
                        # rolls must not masquerade as '+ssN' lerped ones
                        tag = self._roll_tag
                        if (self._strip_stride > 1
                                and not isinstance(strips_dev, tuple)):
                            tag = tag.replace(
                                f"+ss{self._strip_stride}", "")
                        roll_cache_write = (video_path, duration_s, tag)
                else:
                    frames_roll = jnp.zeros((b, n, self.cfg.model.notes))
        else:
            frames_roll = jnp.zeros((b, n, self.cfg.model.notes), jnp.float32)
        timings["conditioning_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        mask = jnp.arange(n)[None, :] < n_valid
        x0 = self._jax.random.normal(
            self._jax.random.key(seed), (b, n, self.cfg.model.num_channels))
        if fewstep:
            # distilled-student sampler: few uniform steps, single forward per
            # step (cfg_strength=0 skips the batch-doubled CFG branch — the
            # straightened reflow field wants neither, training/distill.py)
            sampler = SamplerConfig(steps=fewstep, cfg_strength=0.0,
                                    sway_sampling=False)
        else:
            sampler = SamplerConfig(steps=steps, cfg_strength=cfg_strength,
                                    sway_sampling=True)
        if passes > 1:
            latents = self._sample_multipass(
                self.cfm, x0, text, frames_roll, ctx, ctx_mask, mask, sampler,
                self._jax.random.key(seed + 1), passes, restart_t)
        else:
            latents = self._sample(self.cfm, x0, text, frames_roll, ctx,
                                   ctx_mask, mask, sampler)
        wav = np.asarray(self._decode(self.codec, latents[:, :n_valid]))
        timings["sample_decode_s"] = _time.perf_counter() - _t0
        if roll_cache_write is not None:
            # device fully drained by the wav fetch: this fetch is free now
            from v2ap_tpu.data import video_io
            video_io.save_feature_cache(
                video_io.piano_roll_cache_path(roll_cache_write[0]),
                np.asarray(frames_roll[0]), roll_cache_write[1],
                tag=roll_cache_write[2])
        # last-call stage report (read by serving/profiling; approximate for
        # async device work, exact at the blocking host-transfer boundaries)
        self.last_timings = timings
        samples = int(duration_s * sr)
        return wav[0, :samples], sr

    def generate_batch(
        self,
        video_paths: Sequence[Optional[str]],
        prompts: Sequence[str],
        *,
        duration_s: float = 10.0,
        steps: int = 25,
        cfg_strength: float = 2.0,
        piano: bool = False,
        seed: int = 0,
        fewstep: Optional[int] = None,
    ) -> Tuple[np.ndarray, int]:
        """Throughput mode: many clips ride the batch axis through ONE
        sampler call (shards over `data` on a pod mesh). All clips share one
        bucketed duration. Returns (b, samples)."""
        jnp = self._jnp
        cond = self.cfg.conditioning
        sr = cond.sampling_rate
        b = len(video_paths)
        assert len(prompts) == b
        n_valid = int(round(duration_s * sr / cond.frame_size))
        max_n = ((self.cfg.model.max_seq_len - self.cfg.model.num_registers)
                 // 96) * 96
        n_valid = min(n_valid, max_n)
        n = min(bucket_length(n_valid), max_n)

        tdim = self.cfg.model.dim_text_raw or self.cfg.model.dim_text
        text = np.zeros((b, n, tdim), np.float32)
        frames_roll = np.zeros((b, n, self.cfg.model.notes), np.float32)
        for i, vp in enumerate(video_paths):
            if vp is None:
                continue
            decoded = []
            strips_src = None
            strided_plan = None
            if piano:
                # fused decode: strips + tower-stride RGB in one codec pass
                # (same as generate(); the towers reuse the RGB instead of a
                # second decode; strips decode at the strip stride)
                from v2ap_tpu.data import video_io
                ss = self._strip_stride
                rgb, s_src, dur, n_src = video_io.read_video_frames_and_strips(
                    vp, step=self._frame_stride,
                    width=cond.piano_frame_w, height=cond.piano_frame_h,
                    strip_step=ss)
                if rgb is not None:
                    decoded.append((rgb, dur, self._frame_stride))
                    if ss > 1:
                        strided_plan = self._strided_strip_plan(
                            s_src, n_src, dur, n_valid)
                    else:
                        strips_src = [(s_src, dur)]
            feats, _ = self.encode_video_frames_clip(vp, n_valid,
                                                     frames_cache=decoded)
            if feats is not None:
                text[i, : len(feats)] = feats[:n]
            if piano:
                if strided_plan is not None:
                    frames_roll[i] = np.asarray(
                        self._roll_from_strips(strided_plan, n))[0]
                else:
                    strips = self.encode_piano_frames(vp, n_valid,
                                                      frames_cache=decoded,
                                                      strips_cache=strips_src)
                    if strips is not None:
                        roll = np.asarray(self._roll_from_strips(
                            self._ship_strips(strips), n))
                        frames_roll[i] = roll[0]

        if all(not p.strip() for p in prompts):
            # all prompts dropped: zero context of any length is bit-identical
            # to the zeroed T5 output (bias-free k/v) — skip the T5 pass
            ctx = jnp.zeros((b, 1, self.cfg.model.dim_context), jnp.float32)
            ctx_mask = jnp.ones((b, 1), bool)
        else:
            eff = [p if p.strip() else "the sound of X X" for p in prompts]
            drop = jnp.asarray([not p.strip() for p in prompts])
            ctx, ctx_mask = self.encode_text(eff)
            ctx = jnp.where(drop[:, None, None], 0.0, ctx)

        mask = jnp.broadcast_to(jnp.arange(n)[None, :] < n_valid, (b, n))
        x0 = self._jax.random.normal(
            self._jax.random.key(seed), (b, n, self.cfg.model.num_channels))
        sampler = (SamplerConfig(steps=fewstep, cfg_strength=0.0,
                                 sway_sampling=False) if fewstep else
                   SamplerConfig(steps=steps, cfg_strength=cfg_strength))
        latents = self._sample(self.cfm, x0, jnp.asarray(text),
                               jnp.asarray(frames_roll), ctx, ctx_mask,
                               mask, sampler)
        wavs = np.asarray(self._decode(self.codec, latents[:, :n_valid]))
        return wavs[:, : int(duration_s * sr)], sr

    def generate_to_file(self, video_path: str, out_path: str, **kw) -> str:
        from v2ap_tpu.data.video_io import mux_audio_onto_video
        wav, sr = self.generate(video_path, **kw)
        mux_audio_onto_video(video_path, wav, sr, out_path)
        return out_path

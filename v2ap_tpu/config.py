"""Typed configuration tree for the whole framework.

The reference drives variants with sentinel probabilities (``audiocond_drop_prob=1.1``
meaning "audio conditioning disabled", ``cond_drop_prob=-0.1`` meaning "always on")
and four copy-pasted model files (reference: src/inference_v2a.py:55-62, SURVEY §5.6).
Here every switch is an explicit, typed field; entry points are thin parsers over
this tree.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Tri-stream CFM transformer (reference: e2_tts_crossatt3.py:707-1143,1275-1523)."""

    # audio stream
    dim: int = 1024
    depth: int = 12
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    # text (CLIP-frame) stream
    dim_text: int = 1280
    text_heads: int = 16
    text_dim_head: int = 64
    text_ff_mult: int = 4
    text_depth: int = 12
    # frames (piano-roll) stream
    dim_frames: int = 512
    frames_heads: int = 8
    frames_dim_head: int = 64
    frames_ff_mult: int = 4
    # positional / conv modules
    max_seq_len: int = 8192
    kernel_size: int = 31
    num_registers: int = 32
    abs_pos_emb: bool = True
    if_audio_conv: bool = True
    if_text_conv: bool = True
    if_cross_attn: bool = True
    # attention options (x_transformers attn_kwargs in the reference)
    gate_value_heads: bool = True
    softclamp_logits: bool = True
    softclamp_value: float = 50.0
    dropout: float = 0.1
    # latent space
    num_channels: int = 128          # EnCodec latent channels
    notes: int = 51                  # piano-roll keys (88 for the full-keyboard variant)
    note_min: int = 15
    note_max: int = 65
    # own a trained Video2RollNet (False for the base `crossatt` variant,
    # which has no piano-roll stream; reference e2_tts_crossatt.py:1198)
    video2roll: bool = True
    # mixed video-encoder mode: raw concat width projected down to dim_text
    # (reference video_encoder="mixed": 4608 -> 1280, e2_tts_crossatt3.py:1464)
    dim_text_raw: Optional[int] = None
    # conditioning projections
    if_cond_proj_in: bool = True
    cond_proj_in_bias: bool = True
    concat_cond: bool = False
    # T5 cross-attention context width (flan-t5-large hidden size)
    dim_context: int = 1024
    # compute dtypes
    dtype: str = "bfloat16"          # activation/compute dtype on TPU
    param_dtype: str = "float32"
    # per-layer rematerialization (jax.checkpoint): recompute activations in
    # backward instead of saving them — required for full-size training on a
    # single 16 GB chip (f32 params + AdamW moments leave no room for saved
    # activations). No effect on inference.
    remat: bool = False
    # remat policy: "full" recomputes everything (min memory);
    # "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
    # saves matmul outputs and recomputes only the cheap elementwise ops,
    # trading ~1.5 GB of saved activations (12x1024, batch 4) for skipping
    # most of the fwd recompute in the backward pass.
    remat_policy: str = "full"
    # Fuse every audio layer's 6 (4 without cross-attn) time-cond projections
    # (AdaptiveRMSNorm gammas + AdaLN-Zero gate logits) into ONE stacked
    # matmul computed before the depth loop. Same math, but it replaces
    # depth*6 tiny (b, dim)x(dim, dim) matmuls — recomputed again per layer
    # under remat — with a single well-shaped one whose outputs are saved
    # residuals. Parity-tested (tests/test_transformer.py).
    fused_adaln: bool = True

    @property
    def video_multi(self) -> float:
        """Temporal ratio between roll frames and latent frames (3.0 for 51-key,
        2.5 for the 88-key variant; reference e2_tts_crossatt3.py:1931)."""
        return 3.0 if self.notes == 51 else 2.5


@dataclass(frozen=True)
class SamplerConfig:
    """Euler ODE sampling (reference: e2_tts_crossatt3.py:2128-2256)."""

    steps: int = 25
    cfg_strength: float = 2.0
    sway_sampling: bool = True
    remove_parallel_component: bool = False
    keep_parallel_frac: float = 0.0
    max_duration: int = 4096
    method: str = "euler"            # euler | midpoint | heun


@dataclass(frozen=True)
class ConditioningConfig:
    """Frozen encoder stack (reference: e2_tts_crossatt3.py:1411-1523)."""

    text_encoder: str = "flan-t5-large"       # prompt -> cross-attention context
    video_encoder: str = "clip_vit"           # per-frame image embeddings
    sampling_rate: int = 24_000
    frame_size: int = 320                      # latent hop: 75 Hz at 24 kHz
    audiocond_drop_prob: float = 1.1           # >1.0 == audio conditioning disabled
    cond_drop_prob: float = 0.2                # drop CLIP stream (training CFG)
    prompt_drop_prob: float = 0.1              # drop T5 prompt (training CFG)
    frac_lengths_mask: Tuple[float, float] = (0.7, 1.0)
    audiocond_snr: Optional[Tuple[float, float]] = None
    feature_cache: bool = True                 # on-disk .npz frame-feature cache
    # Serving-only conditioning subsample: encode every Nth video frame
    # through the vision tower and linearly interpolate features between the
    # encoded anchors (stride 1 = reference parity, every frame + nearest
    # interp, e2_tts_crossatt3.py:1800-1813). The tower pass dominates cold
    # serving, so stride N cuts its device time ~N-fold. Default 3: measured
    # conditioning drift on the real ViT-bigG is 0.93% rel-rms on smooth
    # video-like content (scripts/probe_subsample_drift.py, TPU r4) — BELOW
    # the 1.39% the accepted bf16 compute dtype already incurs (stride 2:
    # 0.66%, stride 4: 1.08%). Env V2AP_FRAME_STRIDE overrides at pipeline
    # construction; 1 restores reference parity.
    frame_stride: int = 3
    # piano branch
    piano_frame_h: int = 100
    piano_frame_w: int = 900
    piano_window: int = 5                      # stacked consecutive frames
    # Serving-only keyboard-strip subsample (cold V2P lever): the fused
    # decoder grabs()-skips frames between every Nth strip and the device
    # lerps rolls between the strided anchors (interp_weights_piano). The
    # full-rate strip decode is ~2/3 of cold V2P host time and the strips
    # another ~21 MB of wire. Stride 1 = reference parity (every frame,
    # exact index selection). Env V2AP_STRIP_STRIDE overrides; drift is
    # bounded by scripts/probe_strip_stride.py.
    strip_stride: int = 2


@dataclass(frozen=True)
class DataConfig:
    """Training data pipeline (reference: trainer_multigpus_alldatas3.py:466-1455)."""

    target_length: int = 750                   # 10 s of 75 Hz latents
    min_target_length: int = 750
    hop_size: int = 320
    sample_rate: int = 24_000
    oversample_multi: int = 4                  # candidate oversampling factor
    keep_last: int = 5                         # rows kept per oversampled batch
    theta_ratio: float = 0.5                   # SE / non-SE corpus resampling ratio
    clap_filter: bool = False
    mix_augment: bool = True
    num_workers: int = 8
    seed: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh over ICI (reference used 2-GPU DDP; SURVEY §5.8)."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1                     # -1 == all devices
    model_parallel: int = 1


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 7.5e-5
    warmup_steps: int = 20_000
    decay_steps: int = 1_000_000
    grad_accum: int = 1
    grad_clip: float = 1.0
    batch_size: int = 8
    epochs: int = 10
    save_step: int = 2000
    midi_loss_weight: float = 10.0             # reference e2_tts_crossatt3.py:2574
    mu_bf16: bool = False                      # bf16 AdamW first moment (saves ~1.5 GB at full size)
    ema_decay: float = 0.999
    use_ema: bool = False
    switch_ema_every: int = 0                  # >0: copy EMA->model every N steps ("switch EMA"; the reference's dead use_switch_ema flag, trainer...3.py:449)
    # DPO preference optimization (reference: e2_tts_crossatt3.py:2504-2566)
    dpo: bool = False
    dpo_beta: float = 1.0
    velocity_consistency_weight: float = -1e-5  # <=0 disables
    # FactorCL contrastive alignment (reference: e2_tts_crossatt6.py:884,1027-1061)
    contrastive: bool = False
    contrastive_weight: float = 1.0
    contrastive_layer: int = 1                 # hidden-layer tap (reference: layer 1)


@dataclass(frozen=True)
class V2APConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)
    conditioning: ConditioningConfig = field(default_factory=ConditioningConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    # ------------------------------------------------------------------ io
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, **kw: Any) -> str:
        return json.dumps(self.to_dict(), indent=2, **kw)

    @classmethod
    def from_dict(cls, d: dict) -> "V2APConfig":
        def build(klass, sub):
            fields = {f.name: f for f in dataclasses.fields(klass)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    raise KeyError(f"unknown config key {klass.__name__}.{k}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return klass(**kwargs)

        return cls(
            model=build(ModelConfig, d.get("model", {})),
            sampler=build(SamplerConfig, d.get("sampler", {})),
            conditioning=build(ConditioningConfig, d.get("conditioning", {})),
            data=build(DataConfig, d.get("data", {})),
            mesh=build(MeshConfig, d.get("mesh", {})),
            train=build(TrainConfig, d.get("train", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "V2APConfig":
        return cls.from_dict(json.loads(s))

    def replace(self, **sections: Any) -> "V2APConfig":
        return dataclasses.replace(self, **sections)


def v2a_default() -> V2APConfig:
    """The shipped V2A/V2P config (reference: src/inference_v2a.py:74-111)."""
    return V2APConfig()


def v2p_88key() -> V2APConfig:
    """88-key full-keyboard variant (reference: e2_tts_crossatt3_2.py:74-76)."""
    cfg = V2APConfig()
    return cfg.replace(model=dataclasses.replace(cfg.model, notes=88, note_min=0, note_max=87))


VARIANTS = ("crossatt", "crossatt6", "crossatt3", "crossatt3_2")


def variant_preset(name: str) -> V2APConfig:
    """One config per reference model/trainer variant (the reference keeps
    four ~95%-duplicated model files — SURVEY §1 variant matrix):

      * ``crossatt``    — base T2A/V2A, no piano-roll stream / Video2RollNet
        (e2_tts_crossatt.py:1198);
      * ``crossatt6``   — + FactorCL contrastive audio<->video loss
        (e2_tts_crossatt6.py:884,1027-1061);
      * ``crossatt3``   — shipped V2A+V2P: frames stream + Video2RollNet +
        MIDI loss (e2_tts_crossatt3.py:70-72);
      * ``crossatt3_2`` — 88-key full-keyboard variant
        (e2_tts_crossatt3_2.py:74-76).
    """
    cfg = V2APConfig()
    if name == "crossatt":
        return cfg.replace(
            model=dataclasses.replace(cfg.model, video2roll=False))
    if name == "crossatt6":
        return cfg.replace(
            model=dataclasses.replace(cfg.model, video2roll=False),
            train=dataclasses.replace(cfg.train, contrastive=True))
    if name == "crossatt3":
        return cfg
    if name == "crossatt3_2":
        return v2p_88key()
    raise ValueError(f"unknown variant {name!r}; expected one of {VARIANTS}")


def dryrun_test() -> V2APConfig:
    """Minimum-compile-surface config for the cold multichip dry-run: real
    tri-stream structure + Video2Roll + DP×TP shardings, but the smallest
    layer count that still exercises the U-Net skip logic (depth 2 = one
    down/up pair). The dry-run compiles cold on a foreign host (no persistent
    cache — see __graft_entry__), so XLA compile time is the budget."""
    cfg = tiny_test()
    return cfg.replace(
        model=dataclasses.replace(cfg.model, depth=2, text_depth=2))


def tiny_tower_test() -> V2APConfig:
    """tiny_test with stream widths matched to the tiny frozen towers
    (models.t5.t5_tiny_test d_model=32, models.clip_vit.clip_tiny_test
    projection_dim=16) — the config the CPU-runnable ``--tiny`` entry-point
    drives use. Training windows shrink to fit tiny max_seq_len."""
    cfg = tiny_test()
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model, dim_text=16, dim_context=32, num_channels=8),
        data=dataclasses.replace(cfg.data, target_length=96,
                                 min_target_length=96))


def tiny_test() -> V2APConfig:
    """A CPU-runnable miniature for unit tests and the multichip dry-run."""
    cfg = V2APConfig()
    return cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            dim=64, depth=4, heads=2, dim_head=32,
            dim_text=48, text_heads=2, text_dim_head=32, text_depth=4,
            dim_frames=32, frames_heads=2, frames_dim_head=16,
            max_seq_len=256, kernel_size=7, num_registers=4,
            num_channels=16, notes=51, dim_context=32,
            dtype="float32",
        ),
        sampler=dataclasses.replace(cfg.sampler, steps=4),
        # parity numerics for tests: every decoded frame feeds the tower
        # and every frame yields an exact keyboard strip
        conditioning=dataclasses.replace(cfg.conditioning, frame_stride=1,
                                         strip_stride=1),
    )

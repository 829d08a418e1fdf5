"""v2ap_tpu — TPU-native video-to-audio & video-to-piano generation framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
acappemin/Video-to-Audio-and-Piano-RP (see SURVEY.md): an E2-TTS-style
conditional flow-matching transformer over EnCodec 24 kHz latents, conditioned
on CLIP ViT-bigG frame embeddings, FLAN-T5 prompt embeddings and (for piano)
a Video2Roll piano-roll stream, sampled with a sway-scheduled Euler ODE under
classifier-free guidance — all expressed as jitted XLA programs with Pallas
kernels on the hot path and `jax.sharding` meshes for multi-chip scale.

Package layout:
  ops/        Pallas kernels + pure-JAX building blocks (attention, norms, rope, ...)
  models/     model definitions (tri-stream CFM transformer, EnCodec, Video2Roll, T5, CLIP)
  parallel/   device mesh + sharding rules
  data/       host-side media IO and the training data pipeline
  training/   train loop, optimizer, EMA, DPO/contrastive hooks
  pipelines/  end-to-end inference pipelines (generate, chunked long-video merge)
  utils/      checkpointing, config, logging
"""

__version__ = "0.1.0"

from v2ap_tpu.config import (  # noqa: F401
    ModelConfig,
    SamplerConfig,
    ConditioningConfig,
    DataConfig,
    MeshConfig,
    TrainConfig,
    V2APConfig,
)

from v2ap_tpu.evaluation.metrics import (   # noqa: F401
    clap_similarity, default_embedder, fad, fad_from_embeddings,
    frechet_distance, set_embedder,
)

from v2ap_tpu.data.audio_io import (  # noqa: F401
    read_wav, write_wav, resample, normalize_wav, pad_or_repeat,
    select_max_energy_segment, load_training_clip,
)
from v2ap_tpu.data.mixing import mix_waveforms, mix_captions  # noqa: F401
from v2ap_tpu.data.manifests import (  # noqa: F401
    Sample, CorpusSpec, load_corpus, load_corpora, default_corpora,
)
from v2ap_tpu.data.dataset import Batch, TrainBatcher  # noqa: F401

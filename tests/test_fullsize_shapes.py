"""Full-size converter shape audits (round-1 VERDICT weak #5): run the real
torch->JAX converters at the REAL published hyperparameters against
zero-weight torch models built from HF config objects — a transposed or
mis-sized dimension in any full-size config (bigG 48x1664, flan-t5-large
24x1024, dinov2-giant 40x1536, convnext-xxl, clap-htsat) fails here at
assignment time without needing the actual checkpoints.

torch models are constructed on the meta device (no memory); their state
dicts are re-materialised as zero tensors (calloc — virtual pages) before
feeding the converters. JAX models build via create_model_zeros (abstract
trace + zero materialisation) so no full-size init compiles run.
"""

import gc

import numpy as np
import pytest
from flax import nnx

torch = pytest.importorskip("torch")


class _ZeroShim:
    """Exposes .state_dict() of zero tensors with a meta model's shapes."""

    def __init__(self, meta_model):
        self._sd = {k: torch.zeros(v.shape, dtype=torch.float32)
                    for k, v in meta_model.state_dict().items()}

    def state_dict(self):
        return self._sd


def _meta(builder, cfg):
    with torch.device("meta"):
        return builder(cfg)


def test_clip_bigg_fullsize_shapes():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection
    from v2ap_tpu.models.clip_vit import CLIPVisionModel, clip_vit_bigg
    from v2ap_tpu.utils.jitting import create_model_zeros
    from v2ap_tpu.utils.torch_convert import load_clip_vision_from_torch

    cfg = clip_vit_bigg()
    # the published IP-Adapter SDXL image-encoder hyperparameters
    hf = HFCfg(hidden_size=1664, intermediate_size=8192,
               num_hidden_layers=48, num_attention_heads=16,
               image_size=224, patch_size=14, projection_dim=1280,
               hidden_act="gelu")
    shim = _ZeroShim(_meta(CLIPVisionModelWithProjection, hf))
    jmodel = create_model_zeros(lambda: CLIPVisionModel(cfg, rngs=nnx.Rngs(0)))
    load_clip_vision_from_torch(shim, jmodel)
    assert jmodel.visual_projection.kernel[...].shape == (1664, 1280)
    del jmodel, shim
    gc.collect()


def test_clip_l336_fullsize_shapes():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection
    from v2ap_tpu.models.clip_vit import CLIPVisionModel, clip_vit_l_336
    from v2ap_tpu.utils.jitting import create_model_zeros
    from v2ap_tpu.utils.torch_convert import load_clip_vision_from_torch

    cfg = clip_vit_l_336()
    hf = HFCfg(hidden_size=1024, intermediate_size=4096,
               num_hidden_layers=24, num_attention_heads=16,
               image_size=336, patch_size=14, projection_dim=768,
               hidden_act="quick_gelu")
    shim = _ZeroShim(_meta(CLIPVisionModelWithProjection, hf))
    jmodel = create_model_zeros(lambda: CLIPVisionModel(cfg, rngs=nnx.Rngs(0)))
    load_clip_vision_from_torch(shim, jmodel)
    del jmodel, shim
    gc.collect()


def test_t5_large_fullsize_shapes():
    from transformers import T5Config as HFCfg
    from transformers import T5EncoderModel
    from v2ap_tpu.models.t5 import T5Encoder, flan_t5_large
    from v2ap_tpu.utils.jitting import create_model_zeros
    from v2ap_tpu.utils.torch_convert import load_t5_from_torch

    cfg = flan_t5_large()
    hf = HFCfg(vocab_size=32128, d_model=1024, d_kv=64, d_ff=2816,
               num_layers=24, num_heads=16,
               feed_forward_proj="gated-gelu")     # flan-t5-large card
    shim = _ZeroShim(_meta(T5EncoderModel, hf))
    jmodel = create_model_zeros(lambda: T5Encoder(cfg, rngs=nnx.Rngs(0)))
    load_t5_from_torch(shim, jmodel)
    del jmodel, shim
    gc.collect()


def test_dinov2_giant_fullsize_shapes():
    from transformers import Dinov2Config as HFCfg
    from transformers import Dinov2Model as HFModel
    from v2ap_tpu.models.dinov2 import Dinov2Model, dinov2_giant
    from v2ap_tpu.utils.jitting import create_model_zeros
    from v2ap_tpu.utils.torch_convert import load_dinov2_from_torch

    cfg = dinov2_giant()
    # facebook/dinov2-giant ships at 518 px; the converter interpolates the
    # position table down to the serving crop (224 -> 16x16 grid)
    hf = HFCfg(hidden_size=1536, num_hidden_layers=40,
               num_attention_heads=24, mlp_ratio=4, use_swiglu_ffn=True,
               image_size=518, patch_size=14)
    shim = _ZeroShim(_meta(HFModel, hf))
    jmodel = create_model_zeros(lambda: Dinov2Model(cfg, rngs=nnx.Rngs(0)))
    load_dinov2_from_torch(shim, jmodel)
    assert jmodel.position_embedding[...].shape == (257, 1536)
    del jmodel, shim
    gc.collect()


def test_convnext_xxl_fullsize_shapes():
    from transformers import ConvNextConfig as HFCfg
    from transformers import ConvNextModel as HFModel
    from v2ap_tpu.models.convnext import ConvNextCLIP, convnext_xxlarge
    from v2ap_tpu.utils.jitting import create_model_zeros
    from v2ap_tpu.utils.torch_convert import load_convnext_from_torch

    cfg = convnext_xxlarge()
    hf = HFCfg(depths=[3, 4, 30, 3], hidden_sizes=[384, 768, 1536, 3072])
    shim = _ZeroShim(_meta(HFModel, hf))
    jmodel = create_model_zeros(lambda: ConvNextCLIP(cfg, rngs=nnx.Rngs(0)))
    load_convnext_from_torch(shim, jmodel)
    assert jmodel.head_fc2.kernel[...].shape == (2048, 1024)
    del jmodel, shim
    gc.collect()


def test_clap_htsat_fullsize_shapes():
    from transformers import ClapConfig as HFCfg
    from transformers import ClapModel as HFModel
    from v2ap_tpu.models.clap import ClapModel, clap_htsat_unfused
    from v2ap_tpu.utils.jitting import create_model_zeros
    from v2ap_tpu.utils.torch_convert import load_clap_from_torch

    audio_cfg, text_cfg = clap_htsat_unfused()
    hf = HFCfg()                     # defaults ARE laion/clap-htsat-unfused
    shim = _ZeroShim(_meta(HFModel, hf))
    jmodel = create_model_zeros(lambda: ClapModel(audio_cfg, text_cfg,
                                            rngs=nnx.Rngs(0)))
    load_clap_from_torch(shim, jmodel)
    del jmodel, shim
    gc.collect()

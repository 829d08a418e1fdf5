"""T5 encoder and CLIP vision tower: parity vs torch HF implementations with
shared random weights (tiny configs, no network)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from v2ap_tpu.models.clip_vit import CLIPVisionModel, clip_tiny_test
from v2ap_tpu.models.t5 import T5Encoder, t5_tiny_test
from v2ap_tpu.utils.jitting import create_model

t5_fwd = nnx.jit(lambda m, ids, mask: m(ids, mask))
clip_fwd = nnx.jit(lambda m, px: m(px))


def test_t5_shapes_and_mask():
    cfg = t5_tiny_test()
    model = create_model(lambda: T5Encoder(cfg, rngs=nnx.Rngs(0)))
    ids = jnp.asarray([[3, 5, 7, 1, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
    out = t5_fwd(model, ids, mask)
    assert out.shape == (1, 6, cfg.d_model)
    np.testing.assert_allclose(np.asarray(out[0, 4:]), 0.0, atol=1e-7)


def test_t5_parity_with_torch():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel
    from v2ap_tpu.utils.torch_convert import load_t5_from_torch

    cfg = t5_tiny_test()
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(0)
    tmodel = T5EncoderModel(hf_cfg).eval()

    jmodel = create_model(lambda: T5Encoder(cfg, rngs=nnx.Rngs(0)))
    load_t5_from_torch(tmodel, jmodel)

    ids = np.asarray([[3, 9, 2, 7, 1]], np.int64)
    mask = np.asarray([[1, 1, 1, 1, 1]], np.int64)
    with torch.no_grad():
        t_out = tmodel(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(mask))[0].numpy()
    j_out = np.asarray(t5_fwd(jmodel, jnp.asarray(ids, jnp.int32),
                              jnp.asarray(mask, jnp.int32)))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-4)


def test_clip_shapes():
    cfg = clip_tiny_test()
    model = create_model(lambda: CLIPVisionModel(cfg, rngs=nnx.Rngs(0)))
    px = jnp.zeros((3, cfg.image_size, cfg.image_size, 3))
    out = clip_fwd(model, px)
    assert out.shape == (3, cfg.projection_dim)


def test_clip_parity_with_torch():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig as HFCLIPConfig
    from transformers import CLIPVisionModelWithProjection
    from v2ap_tpu.utils.torch_convert import load_clip_vision_from_torch

    cfg = clip_tiny_test()
    hf_cfg = HFCLIPConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        projection_dim=cfg.projection_dim, hidden_act=cfg.hidden_act,
        attention_dropout=0.0)
    torch.manual_seed(0)
    tmodel = CLIPVisionModelWithProjection(hf_cfg).eval()

    jmodel = create_model(lambda: CLIPVisionModel(cfg, rngs=nnx.Rngs(0)))
    load_clip_vision_from_torch(tmodel, jmodel)

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)
                    ).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(pixel_values=torch.from_numpy(px)).image_embeds.numpy()
    j_out = np.asarray(clip_fwd(jmodel,
                                jnp.asarray(px.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-4)


def test_clip_preprocess():
    from v2ap_tpu.models.clip_vit import preprocess_frames
    frames = (np.random.default_rng(0).random((2, 30, 40, 3)) * 255
              ).astype(np.uint8)
    out = preprocess_frames(frames, image_size=28)
    assert out.shape == (2, 28, 28, 3)
    assert np.isfinite(out).all()


def test_dinov2_parity_with_torch():
    """JAX Dinov2 tower vs HF torch Dinov2Model (pooler_output), both MLP and
    the giant variant's SwiGLU feed-forward."""
    torch = pytest.importorskip("torch")
    from transformers import Dinov2Config as HFDinoConfig
    from transformers import Dinov2Model as HFDinov2
    from v2ap_tpu.models.dinov2 import Dinov2Model, dinov2_tiny_test
    from v2ap_tpu.utils.torch_convert import load_dinov2_from_torch

    for swiglu in (True, False):
        cfg = dinov2_tiny_test()
        import dataclasses
        cfg = dataclasses.replace(cfg, use_swiglu_ffn=swiglu)
        hf_cfg = HFDinoConfig(
            hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
            use_swiglu_ffn=swiglu, image_size=cfg.image_size,
            patch_size=cfg.patch_size, layerscale_value=cfg.layerscale_value,
            layer_norm_eps=cfg.layer_norm_eps, hidden_act="gelu",
            attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
            drop_path_rate=0.0)
        torch.manual_seed(0)
        tmodel = HFDinov2(hf_cfg).eval()

        jmodel = create_model(lambda: Dinov2Model(cfg, rngs=nnx.Rngs(0)))
        load_dinov2_from_torch(tmodel, jmodel)

        rng = np.random.default_rng(0)
        px = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)
                        ).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(pixel_values=torch.from_numpy(px)
                           ).pooler_output.numpy()
        j_out = np.asarray(clip_fwd(jmodel,
                                    jnp.asarray(px.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(j_out, t_out, rtol=2e-3, atol=2e-4)


def test_convnext_trunk_parity_with_torch():
    """JAX ConvNeXt trunk vs HF torch ConvNextModel (pooler_output = pooled,
    layer-normed features); the open_clip MLP head is shape-checked."""
    torch = pytest.importorskip("torch")
    from transformers import ConvNextConfig as HFConvNextConfig
    from transformers import ConvNextModel as HFConvNext
    from v2ap_tpu.models.convnext import ConvNextCLIP, convnext_tiny_test
    from v2ap_tpu.utils.torch_convert import load_convnext_from_torch

    cfg = convnext_tiny_test()
    hf_cfg = HFConvNextConfig(
        depths=list(cfg.depths), hidden_sizes=list(cfg.hidden_sizes),
        image_size=cfg.image_size, layer_norm_eps=cfg.layer_norm_eps,
        layer_scale_init_value=cfg.layer_scale_init, drop_path_rate=0.0,
        hidden_act="gelu")
    torch.manual_seed(0)
    tmodel = HFConvNext(hf_cfg).eval()

    jmodel = create_model(lambda: ConvNextCLIP(cfg, rngs=nnx.Rngs(0)))
    load_convnext_from_torch(tmodel, jmodel)

    rng = np.random.default_rng(0)
    px = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)
                    ).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(pixel_values=torch.from_numpy(px)
                       ).pooler_output.numpy()
    jx = jnp.asarray(px.transpose(0, 2, 3, 1))
    j_pooled = np.asarray(nnx.jit(lambda m, x: m.pooled(x))(jmodel, jx))
    np.testing.assert_allclose(j_pooled, t_out, rtol=2e-3, atol=2e-4)
    # projection head output width
    emb = np.asarray(clip_fwd(jmodel, jx))
    assert emb.shape == (2, cfg.embed_dim)
    assert np.isfinite(emb).all()


def test_video2roll_parity_with_torch_reference():
    """Behavioral parity of the JAX Video2RollNet against the Audeo torch
    implementation (random shared weights, the real 5x100x900 input)."""
    torch = pytest.importorskip("torch")
    import sys
    sys.path.insert(0, "/root/reference/src/audeo")
    try:
        import Video2RollNet as torch_v2r
    except Exception:
        pytest.skip("reference Video2RollNet not importable")
    finally:
        sys.path.pop(0)

    from v2ap_tpu.models.video2roll import Video2RollNet
    from v2ap_tpu.utils.torch_convert import load_video2roll_from_torch

    torch.manual_seed(0)
    tnet = torch_v2r.resnet18(num_classes=51).eval()
    jnet = create_model(lambda: Video2RollNet(num_classes=51,
                                              rngs=nnx.Rngs(0)))
    load_video2roll_from_torch(tnet, jnet)

    rng = np.random.default_rng(0)
    x = rng.random((2, 5, 100, 900)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(x)).numpy()
    j_out = np.asarray(nnx.jit(lambda m, x: m(x))(jnet, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, rtol=2e-2, atol=2e-3)

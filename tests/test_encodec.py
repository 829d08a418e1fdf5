"""EnCodec JAX implementation: shape tests + numerical parity against the
torch HF implementation with shared random weights (no network needed)."""

import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from v2ap_tpu.models.encodec import EncodecConfig, EncodecModel
from v2ap_tpu.utils.jitting import create_model

jit_encode = nnx.jit(lambda m, w: m.encode(w))
jit_decode = nnx.jit(lambda m, l: m.decode(l))


def tiny_cfg():
    return EncodecConfig(num_filters=4, hidden_size=8, upsampling_ratios=(4, 2),
                         num_lstm_layers=1, num_quantizers=2, codebook_size=16)


def test_encode_decode_shapes():
    cfg = tiny_cfg()
    model = create_model(lambda: EncodecModel(cfg, rngs=nnx.Rngs(0)))
    wav = jnp.zeros((2, 8 * 25))       # hop = 8
    lat = jit_encode(model, wav)
    assert lat.shape == (2, 25, cfg.hidden_size)
    out = jit_decode(model, lat)
    assert out.shape[0] == 2 and out.shape[1] >= 8 * 25


def test_rvq_roundtrip():
    cfg = tiny_cfg()
    model = create_model(lambda: EncodecModel(cfg, rngs=nnx.Rngs(0)))
    lat = jnp.asarray(np.random.default_rng(0).normal(size=(1, 7, 8)), jnp.float32)
    codes = model.quantizer.encode(lat, 2)
    assert codes.shape == (2, 1, 7)
    rec = model.quantizer.decode(codes)
    assert rec.shape == lat.shape
    # residual quantization reduces error monotonically
    rec1 = model.quantizer.decode(codes[:1])
    err1 = float(jnp.mean((lat - rec1) ** 2))
    err2 = float(jnp.mean((lat - rec) ** 2))
    assert err2 <= err1


@pytest.mark.parametrize("seq", [800, 1000])
def test_parity_with_torch(seq):
    torch = pytest.importorskip("torch")
    from transformers.models.encodec.configuration_encodec import (
        EncodecConfig as HFConfig)
    from transformers.models.encodec.modeling_encodec import (
        EncodecModel as HFModel)
    from v2ap_tpu.utils.torch_convert import load_encodec_from_torch

    hf_cfg = HFConfig(num_filters=4, hidden_size=8, upsampling_ratios=[4, 2],
                      num_lstm_layers=1, codebook_size=16,
                      target_bandwidths=[0.5])
    torch.manual_seed(0)
    tmodel = HFModel(hf_cfg).eval()

    cfg = tiny_cfg()
    jmodel = create_model(lambda: EncodecModel(cfg, rngs=nnx.Rngs(0)))
    load_encodec_from_torch(tmodel, jmodel)

    rng = np.random.default_rng(1)
    wav = rng.normal(size=(1, seq)).astype(np.float32) * 0.3

    with torch.no_grad():
        t_lat = tmodel.encoder(torch.from_numpy(wav)[:, None, :])
    j_lat = jit_encode(jmodel, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(j_lat),
                               t_lat.numpy().transpose(0, 2, 1),
                               rtol=1e-3, atol=1e-4)

    with torch.no_grad():
        t_wav = tmodel.decoder(t_lat)
    j_wav = jit_decode(jmodel, j_lat)
    np.testing.assert_allclose(np.asarray(j_wav), t_wav.numpy()[:, 0, :],
                               rtol=1e-3, atol=1e-4)

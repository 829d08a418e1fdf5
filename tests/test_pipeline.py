"""End-to-end generation pipeline on tiny configs + synthetic video."""

import os

import numpy as np
import pytest

from v2ap_tpu import config as cfglib
from v2ap_tpu.config import V2APConfig
from v2ap_tpu.models.clip_vit import clip_tiny_test
from v2ap_tpu.models.t5 import t5_tiny_test
from v2ap_tpu.pipelines.generate import (
    FallbackTokenizer, V2APipeline, bucket_length,
)


def tiny_pipeline_cfg() -> V2APConfig:
    import dataclasses
    cfg = cfglib.tiny_test()
    # dim_text must match the CLIP projection dim; dim_context the T5 d_model
    return cfg.replace(model=dataclasses.replace(
        cfg.model, dim_text=16, dim_context=32, num_channels=8))


def write_synthetic_video(path: str, frames: int = 12, fps: int = 4,
                          size=(64, 48)) -> bool:
    import cv2
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    if not w.isOpened():
        return False
    rng = np.random.default_rng(0)
    for i in range(frames):
        frame = np.full((size[1], size[0], 3), i * 20 % 255, np.uint8)
        frame += rng.integers(0, 30, frame.shape, dtype=np.uint8)
        w.write(frame)
    w.release()
    return os.path.getsize(path) > 0


@pytest.fixture(scope="module")
def pipeline():
    # tiny encodec config keeps decode cheap
    import v2ap_tpu.models.encodec as enc

    orig = enc.EncodecConfig
    cfg = tiny_pipeline_cfg()
    pipe = V2APipeline(cfg, t5_config=t5_tiny_test(),
                       clip_config=clip_tiny_test())
    return pipe


def test_bucket_length():
    assert bucket_length(1) == 96
    assert bucket_length(96) == 96
    assert bucket_length(97) == 192


def test_fallback_tokenizer_stable():
    tok = FallbackTokenizer(100)
    ids1, m1 = tok(["a dog barks"])
    ids2, _ = tok(["a dog barks"])
    np.testing.assert_array_equal(ids1, ids2)
    assert m1[0].sum() == 4            # 3 words + eos


def test_generate_promptless_no_video(pipeline):
    wav, sr = pipeline.generate(None, "", duration_s=1.0, steps=2, seed=0)
    assert sr == 24_000
    assert wav.shape == (24_000,)
    assert np.isfinite(wav).all()


def test_generate_with_prompt_differs(pipeline):
    w1, _ = pipeline.generate(None, "", duration_s=1.0, steps=2, seed=0)
    w2, _ = pipeline.generate(None, "dog barking in the rain",
                              duration_s=1.0, steps=2, seed=0)
    assert not np.allclose(w1, w2)


def test_generate_from_video(pipeline, tmp_path):
    video = str(tmp_path / "synth.mp4")
    if not write_synthetic_video(video):
        pytest.skip("cv2 video writer unavailable")
    wav, sr = pipeline.generate(video, "test", steps=2, seed=1)
    # 12 frames @ 4 fps = 3 s video; the tiny config's max_seq_len clamps the
    # latent length to 192 frames = 2.56 s
    assert 2 * 24_000 < wav.shape[0] <= 3 * 24_000
    assert np.isfinite(wav).all()
    # feature cache written next to the video and reused
    assert os.path.exists(str(tmp_path / "synth.generated.npz"))
    wav2, _ = pipeline.generate(video, "test", steps=2, seed=1)
    np.testing.assert_allclose(wav, wav2)


def test_generate_piano_branch(pipeline, tmp_path):
    video = str(tmp_path / "piano.mp4")
    if not write_synthetic_video(video):
        pytest.skip("cv2 video writer unavailable")
    wav, sr = pipeline.generate(video, "", steps=2, piano=True, seed=2)
    assert 2 * 24_000 < wav.shape[0] <= 3 * 24_000
    assert np.isfinite(wav).all()
    assert os.path.exists(str(tmp_path / "piano.generated_frames_raw.2.npz"))
    # roll-level cache written on the first pass; the cache-hit path (skips
    # strip upload + Video2Roll) must reproduce the same audio bit-exactly
    assert os.path.exists(str(tmp_path / "piano.generated_roll.npz"))
    wav2, _ = pipeline.generate(video, "", steps=2, piano=True, seed=2)
    np.testing.assert_allclose(wav, wav2)


def test_generate_long_chunked(pipeline, tmp_path):
    from v2ap_tpu.pipelines.merge import generate_long
    video = str(tmp_path / "long.mp4")
    if not write_synthetic_video(video, frames=20, fps=4):
        import pytest as _pytest
        _pytest.skip("cv2 video writer unavailable")
    # 5 s video, 2 s chunks with 0.5 s overlap -> batched multi-chunk path
    wav, sr = generate_long(pipeline, video, "drums", chunk_s=2.0,
                            overlap_s=0.5, steps=2, seed=0)
    assert sr == 24_000
    assert abs(len(wav) - 5 * sr) <= sr // 2
    assert np.isfinite(wav).all()


def test_generate_batch_throughput(pipeline, tmp_path):
    video = str(tmp_path / "bt.mp4")
    has_video = write_synthetic_video(video, frames=8, fps=4)
    paths = [video if has_video else None, None, None]
    prompts = ["drums", "", "rain"]
    wavs, sr = pipeline.generate_batch(paths, prompts, duration_s=1.0,
                                       steps=2, seed=3)
    assert wavs.shape == (3, 24_000)
    assert np.isfinite(wavs).all()
    # different prompts produce different clips
    assert not np.allclose(wavs[1], wavs[2])


def test_pipeline_load_weights_roundtrip(pipeline, tmp_path):
    from v2ap_tpu.utils.checkpoint import save_model
    import os
    ckpt = str(tmp_path / "ckpt")
    pipeline.cfm.proj_in.kernel[...] = pipeline.cfm.proj_in.kernel[...] * 0 + 3.25
    save_model(os.path.join(ckpt, "cfm"), pipeline.cfm)
    pipeline.cfm.proj_in.kernel[...] = pipeline.cfm.proj_in.kernel[...] * 0
    loaded = pipeline.load_weights(ckpt)
    assert loaded == ["cfm"]
    assert float(np.asarray(pipeline.cfm.proj_in.kernel[...]).mean()) == 3.25


def test_generate_long_sharded_over_mesh(pipeline, tmp_path):
    """BASELINE config 5: long-video chunks shard over the (virtual) 8-device
    mesh — one ODE integration spread across chips."""
    import jax
    from v2ap_tpu.config import MeshConfig
    from v2ap_tpu.parallel import make_mesh, shard_model
    from v2ap_tpu.pipelines.merge import generate_long

    video = str(tmp_path / "mesh.mp4")
    if not write_synthetic_video(video, frames=20, fps=4):
        pytest.skip("cv2 video writer unavailable")
    mesh = make_mesh(MeshConfig(), jax.devices())      # data=8
    shard_model(pipeline.cfm, mesh)
    shard_model(pipeline.codec, mesh)
    wav, sr = generate_long(pipeline, video, "drums", chunk_s=2.0,
                            overlap_s=0.5, steps=2, seed=0, mesh=mesh)
    assert sr == 24_000
    assert abs(len(wav) - 5 * sr) <= sr // 2
    assert np.isfinite(wav).all()


def test_all_video_encoder_modes_construct_and_generate(tmp_path):
    """Every ``video_encoder`` value of the reference constructs and produces
    audio: clip_vit / clip_vit2 / clip_convnext / dinov2 / mixed (4608-style
    concat through CFM.proj_text; reference e2_tts_crossatt3.py:1421-1465)."""
    import dataclasses
    from v2ap_tpu.models.clip_vit import CLIPVisionConfig
    from v2ap_tpu.models.convnext import convnext_tiny_test
    from v2ap_tpu.models.dinov2 import dinov2_tiny_test

    video = str(tmp_path / "enc.mp4")
    if not write_synthetic_video(video, frames=6, fps=4):
        pytest.skip("cv2 video writer unavailable")

    towers = {
        "clip_vit": clip_tiny_test(),                       # proj 16
        "clip_vit2": CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_layers=1, num_heads=4,
            image_size=28, patch_size=14, projection_dim=12,
            hidden_act="quick_gelu", dtype="float32"),      # proj 12
        "clip_convnext": convnext_tiny_test(),              # embed 24
        "dinov2": dinov2_tiny_test(),                       # hidden 32
    }
    dims = {"clip_vit": 16, "clip_vit2": 12, "clip_convnext": 24,
            "dinov2": 32}

    for mode in ("clip_vit", "clip_vit2", "clip_convnext", "dinov2", "mixed"):
        cfg = tiny_pipeline_cfg()
        tdim = sum(dims.values()) if mode == "mixed" else dims[mode]
        model = dataclasses.replace(
            cfg.model,
            dim_text=dims["clip_vit"],
            dim_text_raw=tdim if tdim != dims["clip_vit"] else None)
        cond = dataclasses.replace(cfg.conditioning, video_encoder=mode,
                                   feature_cache=False)
        cfg = cfg.replace(model=model, conditioning=cond)
        pipe = V2APipeline(cfg, t5_config=t5_tiny_test(),
                           tower_configs=towers)
        assert pipe.video_embed_dim == tdim
        wav, sr = pipe.generate(video, "a test", duration_s=1.0, steps=2,
                                seed=0)
        assert sr == 24_000 and np.isfinite(wav).all() and len(wav) > 0


def test_generate_int8_cfm_optin():
    """V2AP_INT8_CFM / quantize_cfm=True: int8 CFM core runs end to end and
    stays close to the f32 pipeline (AQT dynamic-range error only). Both
    pipelines are built fresh — earlier tests mutate the shared fixture's
    weights (load_weights roundtrip)."""
    pipe = V2APipeline(tiny_pipeline_cfg(), t5_config=t5_tiny_test(),
                       clip_config=clip_tiny_test())
    qpipe = V2APipeline(tiny_pipeline_cfg(), t5_config=t5_tiny_test(),
                        clip_config=clip_tiny_test(), quantize_cfm=True)
    w1, _ = pipe.generate(None, "", duration_s=1.0, steps=2, seed=0)
    w2, sr = qpipe.generate(None, "", duration_s=1.0, steps=2, seed=0)
    assert sr == 24_000 and np.isfinite(w2).all()
    assert not np.allclose(w1, w2)                  # int8 path engaged
    rel = np.abs(w1 - w2).mean() / (np.abs(w1).mean() + 1e-9)
    assert rel < 0.2, rel


def test_shard_serving_matches_single_device(tmp_path):
    """shard_serving(): tower frame batches shard over the 8-device mesh and
    the whole serving path still produces the single-device waveform."""
    import dataclasses
    import jax
    from v2ap_tpu.config import MeshConfig
    from v2ap_tpu.parallel import make_mesh

    video = str(tmp_path / "shard.mp4")
    if not write_synthetic_video(video, frames=16, fps=4):
        pytest.skip("cv2 video writer unavailable")

    def mk():
        cfg = tiny_pipeline_cfg()
        cfg = cfg.replace(conditioning=dataclasses.replace(
            cfg.conditioning, feature_cache=False))   # tower runs every call
        return V2APipeline(cfg, t5_config=t5_tiny_test(),
                           clip_config=clip_tiny_test())

    w_ref, _ = mk().generate(video, "a prompt", duration_s=1.0, steps=2,
                             seed=0)
    sharded = mk()
    sharded.shard_serving(make_mesh(MeshConfig(), jax.devices()))
    w_sh, sr = sharded.generate(video, "a prompt", duration_s=1.0, steps=2,
                                seed=0)
    assert sr == 24_000
    np.testing.assert_allclose(w_ref, w_sh, rtol=2e-4, atol=2e-5)


def test_video_chunk_reader_matches_full_decode(tmp_path):
    from v2ap_tpu.data import video_io
    video = str(tmp_path / "chunks.mp4")
    if not write_synthetic_video(video, frames=11, fps=5):
        pytest.skip("cv2 video writer unavailable")
    full, duration = video_io.read_video_frames(video)
    reader = video_io.VideoChunkReader(video, chunk=4)
    chunks = [c.copy() for c in reader]
    assert [len(c) for c in chunks] == [4, 4, 3]
    np.testing.assert_array_equal(np.concatenate(chunks), full)
    assert reader.duration == pytest.approx(duration)


def test_stream_decode_path_matches_default(pipeline, tmp_path, monkeypatch):
    """V2AP_STREAM_DECODE=1 pipelines decode/preprocess per chunk; the
    conditioning features (and so the audio) must be identical."""
    import dataclasses
    video = str(tmp_path / "stream.mp4")
    if not write_synthetic_video(video):
        pytest.skip("cv2 video writer unavailable")
    old = pipeline.cfg
    pipeline.cfg = old.replace(conditioning=dataclasses.replace(
        old.conditioning, feature_cache=False))
    try:
        wav_default, _ = pipeline.generate(video, "test", steps=2, seed=3)
        monkeypatch.setenv("V2AP_STREAM_DECODE", "1")
        wav_stream, _ = pipeline.generate(video, "test", steps=2, seed=3)
    finally:
        pipeline.cfg = old
    np.testing.assert_allclose(wav_default, wav_stream)


def test_video_chunk_reader_chunk_larger_than_video(tmp_path):
    from v2ap_tpu.data import video_io
    video = str(tmp_path / "short.mp4")
    if not write_synthetic_video(video, frames=3, fps=5):
        pytest.skip("cv2 video writer unavailable")
    full, _ = video_io.read_video_frames(video)
    chunks = [c.copy() for c in video_io.VideoChunkReader(video, chunk=16)]
    assert [len(c) for c in chunks] == [3]
    np.testing.assert_array_equal(chunks[0], full)
    missing = [c for c in video_io.VideoChunkReader(str(tmp_path / "no.mp4"),
                                                    chunk=4)]
    assert missing == []


def test_feature_cache_precision_tags(tmp_path):
    """int8-written caches must not serve bf16 parity mode (and vice versa);
    untagged (legacy/strip) caches still load when no tag is requested."""
    from v2ap_tpu.data import video_io
    path = str(tmp_path / "feat.npz")
    feats = np.arange(6, dtype=np.float32).reshape(2, 3)
    video_io.save_feature_cache(path, feats, 1.5, tag="int8")
    got, dur = video_io.load_feature_cache(path, tag="int8")
    np.testing.assert_array_equal(got, feats)
    assert dur == 1.5
    miss, _ = video_io.load_feature_cache(path, tag="bf16")
    assert miss is None
    video_io.save_feature_cache(path, feats, 1.5)      # untagged
    assert video_io.load_feature_cache(path)[0] is not None
    assert video_io.load_feature_cache(path, tag="int8")[0] is None


def test_yuv420_pack_unpack_roundtrip():
    """YUV 4:2:0 shipping (V2AP_SHIP_YUV420): the pack/unpack pair is a
    consistent forward/inverse, so smooth (natural-video-like) content
    reconstructs to within chroma-resample + uint8 rounding error."""
    import jax.numpy as jnp
    from v2ap_tpu.models.clip_vit import pack_yuv420, unpack_yuv420

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    smooth = np.clip(np.stack([
        0.5 + 0.4 * np.sin(2 * np.pi * xx),
        0.5 + 0.4 * np.cos(2 * np.pi * yy),
        0.3 + 0.5 * xx * yy], -1) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    px = np.stack([smooth, np.roll(smooth, 5, axis=1)])
    y, uv = pack_yuv420(px)
    assert y.shape == (2, 64, 64) and uv.shape == (2, 2, 32, 32)
    assert y.nbytes + uv.nbytes == px.nbytes // 2     # the point: half wire
    rec = np.asarray(unpack_yuv420(jnp.asarray(y), jnp.asarray(uv),
                                   jnp.zeros(3), jnp.ones(3)))
    err = np.sqrt(np.mean((rec - px.astype(np.float32) / 255.0) ** 2))
    assert err < 0.02, err          # ~2% of full scale on smooth content
    # a gray image survives essentially exactly (zero chroma)
    gray = np.full((1, 64, 64, 3), 119, np.uint8)
    y, uv = pack_yuv420(gray)
    rec = np.asarray(unpack_yuv420(jnp.asarray(y), jnp.asarray(uv),
                                   jnp.zeros(3), jnp.ones(3)))
    assert np.abs(rec - 119.0 / 255.0).max() < 2.5 / 255.0


def test_generate_yuv420_ship_close_to_rgb(tmp_path, monkeypatch):
    """V2AP_SHIP_YUV420=1 end to end: the tower consumes device-reconstructed
    RGB; features (and thus audio) stay close to the RGB-shipped path, and
    the cache tag separates the two pixel paths."""
    import dataclasses
    video = str(tmp_path / "yuv.mp4")
    if not write_synthetic_video(video, frames=8, fps=4):
        pytest.skip("cv2 video writer unavailable")
    cfg = tiny_pipeline_cfg()
    cfg = cfg.replace(conditioning=dataclasses.replace(
        cfg.conditioning, feature_cache=False))
    rgb_pipe = V2APipeline(cfg, t5_config=t5_tiny_test(),
                           clip_config=clip_tiny_test())
    f_rgb, _ = rgb_pipe.encode_video_frames_clip(video, 64)
    monkeypatch.setenv("V2AP_SHIP_YUV420", "1")
    yuv_pipe = V2APipeline(cfg, t5_config=t5_tiny_test(),
                           clip_config=clip_tiny_test())
    assert yuv_pipe._tower_tag.endswith("+yuv420")
    f_yuv, _ = yuv_pipe.encode_video_frames_clip(video, 64)
    f_rgb, f_yuv = np.asarray(f_rgb), np.asarray(f_yuv)
    denom = np.sqrt(np.mean(f_rgb ** 2)) or 1.0
    drift = np.sqrt(np.mean((f_rgb - f_yuv) ** 2)) / denom
    assert 0 < drift < 0.1, drift   # engaged, but close
    wav, sr = yuv_pipe.generate(video, "test", steps=2, seed=1)
    assert sr == 24_000 and np.isfinite(wav).all() and len(wav) > 0


def test_generate_fewstep_mode(pipeline, tmp_path):
    """fewstep=N = reflow-distilled serving: N uniform Euler steps, no CFG.
    Must run end to end and differ from the 25-step CFG path (different
    sampler program), with identical output shape."""
    video = str(tmp_path / "fs.mp4")
    if not write_synthetic_video(video):
        pytest.skip("cv2 video writer unavailable")
    w_ref, sr = pipeline.generate(video, "rain", steps=4, seed=3)
    w_fs, sr2 = pipeline.generate(video, "rain", steps=25, fewstep=4, seed=3)
    assert sr == sr2 and w_fs.shape == w_ref.shape
    assert np.isfinite(w_fs).all()
    assert not np.allclose(w_fs, w_ref)     # no-CFG single-forward field


def test_frame_stride_subsampled_conditioning(tmp_path, monkeypatch):
    """V2AP_FRAME_STRIDE=2: the tower encodes every 2nd frame and the
    conditioning lerps between anchors — close to the stride-1 features on
    smooth content, cheaper by ~2x tower frames, cache-tagged separately."""
    import dataclasses
    video = str(tmp_path / "stride.mp4")
    if not write_synthetic_video(video, frames=16, fps=4):
        pytest.skip("cv2 video writer unavailable")
    cfg = tiny_pipeline_cfg()
    cfg = cfg.replace(conditioning=dataclasses.replace(
        cfg.conditioning, feature_cache=False))
    base = V2APipeline(cfg, t5_config=t5_tiny_test(),
                       clip_config=clip_tiny_test())
    f1, _ = base.encode_video_frames_clip(video, 64)
    monkeypatch.setenv("V2AP_FRAME_STRIDE", "2")
    strided = V2APipeline(cfg, t5_config=t5_tiny_test(),
                          clip_config=clip_tiny_test())
    assert strided._frame_stride == 2
    assert strided._tower_tag.endswith("+s2")
    f2, _ = strided.encode_video_frames_clip(video, 64)
    f1, f2 = np.asarray(f1), np.asarray(f2)
    assert f1.shape == f2.shape
    denom = np.sqrt(np.mean(f1 ** 2)) or 1.0
    drift = np.sqrt(np.mean((f1 - f2) ** 2)) / denom
    assert 0 < drift < 0.5, drift     # engaged but correlated
    # end to end still works under stride
    wav, sr = strided.generate(video, "", steps=2, seed=0)
    assert sr == 24_000 and np.isfinite(wav).all() and len(wav) > 0


def test_interp_weights_clip_matches_nearest_at_half():
    """The lerp plan at w=0/1 endpoints reduces to the nearest plan's
    neighbors; weights stay in [0,1] and indices in range."""
    from v2ap_tpu.data.video_io import interp_indices_clip, interp_weights_clip
    idx = interp_indices_clip(10, 2.0, 64)
    i0, i1, w = interp_weights_clip(10, 2.0, 64)
    assert i0.shape == i1.shape == w.shape == idx.shape
    assert (i0 <= idx).all() and (idx <= i1 + 1).all()
    assert (0 <= w).all() and (w <= 1).all()
    assert ((i1 - i0) <= 1).all() and (i1 >= i0).all()
    # blended result with round(w) recovers the nearest gather
    near = np.where(w > 0.5, i1, i0)
    np.testing.assert_array_equal(near, idx)


def test_read_video_frames_strided_matches_full(tmp_path):
    """step=N decode == full decode subsampled, with the FULL duration."""
    from v2ap_tpu.data.video_io import read_video_frames
    video = str(tmp_path / "sd.mp4")
    if not write_synthetic_video(video, frames=17, fps=4):
        pytest.skip("cv2 video writer unavailable")
    full, dur_full = read_video_frames(video)
    for step in (2, 3, 5):
        sub, dur_sub = read_video_frames(video, step=step)
        assert dur_sub == pytest.approx(dur_full, abs=1e-6)
        assert len(sub) == len(full[::step])
        np.testing.assert_array_equal(sub, full[::step])
    # max_frames still applies after striding
    few, _ = read_video_frames(video, max_frames=3, step=2)
    assert len(few) == 3


def test_tower_chunk_bucketing_matches_single_dispatch(pipeline, tmp_path,
                                                       monkeypatch):
    """Features must be independent of the chunk plan: a small chunk (full
    chunks + a bucketed tail) equals one whole-video dispatch — the ViT is
    per-frame, so any batching must be invisible."""
    video = str(tmp_path / "chunks.mp4")
    if not write_synthetic_video(video, frames=11, fps=4):
        pytest.skip("cv2 video writer unavailable")
    import dataclasses
    pipeline_cfg = pipeline.cfg
    old = pipeline_cfg.conditioning.feature_cache
    pipeline.cfg = pipeline_cfg.replace(conditioning=dataclasses.replace(
        pipeline_cfg.conditioning, feature_cache=False))
    try:
        f_whole, d1 = pipeline.encode_video_frames_clip(video, 64, chunk=16)
        # chunk 4: 2 full chunks of 4 + tail 3 -> bucket 1..4
        f_bucketed, d2 = pipeline.encode_video_frames_clip(video, 64, chunk=4)
    finally:
        pipeline.cfg = pipeline_cfg.replace(conditioning=dataclasses.replace(
            pipeline_cfg.conditioning, feature_cache=old))
    assert d1 == d2
    np.testing.assert_allclose(np.asarray(f_whole), np.asarray(f_bucketed),
                               rtol=1e-5, atol=1e-5)


def test_generate_batch_piano_fused(pipeline, tmp_path):
    """Batch throughput mode with the piano branch rides the same fused
    decode (strips + tower-stride RGB in one pass) as generate()."""
    video = str(tmp_path / "bp.mp4")
    if not write_synthetic_video(video, frames=8, fps=4):
        pytest.skip("cv2 video writer unavailable")
    wavs, sr = pipeline.generate_batch([video, None], ["", "rain"],
                                       duration_s=1.0, steps=2, piano=True,
                                       seed=5)
    assert wavs.shape == (2, 24_000)
    assert np.isfinite(wavs).all()


def test_generate_piano_strip_stride_mode(pipeline, tmp_path):
    """Strided keyboard strips (grab()-skipped decode + device lerp between
    anchors) must run end to end; at the anchor rows the lerped roll input is
    the exact strip, so on a short clip the wav stays finite and shaped."""
    video = str(tmp_path / "pss.mp4")
    if not write_synthetic_video(video, frames=10, fps=4):
        pytest.skip("cv2 video writer unavailable")
    wav_exact, _ = pipeline.generate(video, "", steps=2, piano=True, seed=9)
    old_ss, old_tag = pipeline._strip_stride, pipeline._roll_tag
    pipeline._strip_stride = 2
    pipeline._roll_tag = old_tag + "+ss2"     # lerped rolls own their cache
    try:
        wav_ss, _ = pipeline.generate(video, "", steps=2, piano=True, seed=9)
        # warm rerun hits the tagged roll cache and reproduces bit-exactly
        wav_ss2, _ = pipeline.generate(video, "", steps=2, piano=True, seed=9)
    finally:
        pipeline._strip_stride, pipeline._roll_tag = old_ss, old_tag
    assert np.isfinite(wav_ss).all()
    assert wav_ss.shape == wav_exact.shape
    np.testing.assert_allclose(wav_ss, wav_ss2)


def test_interp_weights_piano_parity():
    """strip_step=1 must reduce to the exact interp_indices_piano selection
    (all-zero weights); strided plans must hit anchors exactly and lerp a
    linear ramp perfectly in between."""
    from v2ap_tpu.data.video_io import (interp_indices_piano,
                                        interp_weights_piano)

    num_source, dur, length = 37, 3.7, 96
    idx = interp_indices_piano(num_source, dur, length)
    i0, i1, w = interp_weights_piano(num_source, dur, length, strip_step=1)
    np.testing.assert_array_equal(i0, idx)
    assert (w == 0).all()

    for ss in (2, 3):
        i0, i1, w = interp_weights_piano(num_source, dur, length, strip_step=ss)
        n_strided = (num_source + ss - 1) // ss
        assert i0.max() < n_strided and i1.max() < n_strided
        # a ramp source: strided lerp reconstructs the full-rate selection
        ramp = np.arange(num_source, dtype=np.float64)
        strided = ramp[::ss]
        recon = strided[i0] * (1 - w) + strided[i1] * w
        exact = ramp[idx]
        # interior rows reconstruct exactly; the tail past the last anchor
        # clamps (within one stride of the end)
        interior = idx < (n_strided - 1) * ss
        np.testing.assert_allclose(recon[interior], exact[interior],
                                   atol=1e-6)
        anchors = idx % ss == 0
        assert (w[anchors & interior] == 0).all()


def test_generate_piano_strip_half_mode(pipeline, tmp_path):
    """The opt-in 2:1 strip-shipping mode must run end to end and stay close
    to the exact-strip output at the roll level (drift bounded much tighter
    on real content; this asserts the plumbing, not the bound)."""
    video = str(tmp_path / "ph.mp4")
    if not write_synthetic_video(video, frames=8, fps=4):
        pytest.skip("cv2 video writer unavailable")
    wav_exact, _ = pipeline.generate(video, "", steps=2, piano=True, seed=7)
    old_flag, old_tag = pipeline._ship_strip_half, pipeline._roll_tag
    pipeline._ship_strip_half = True
    pipeline._roll_tag = old_tag + "+shalf"   # packed rolls get their own cache
    try:
        wav_half, _ = pipeline.generate(video, "", steps=2, piano=True, seed=7)
    finally:
        pipeline._ship_strip_half, pipeline._roll_tag = old_flag, old_tag
    assert np.isfinite(wav_half).all()
    assert wav_half.shape == wav_exact.shape


def test_yuv420_auto_detection_uses_backend_registry(monkeypatch):
    """yuv420 shipping auto-defaults ON exactly when the axon (tunneled)
    plugin is registered. The plugin's devices report platform "tpu", so a
    default_backend() string check never fires — the r5 composite probe's
    modes field caught that the "default" had silently been RGB since r3.
    The detection must read the backend registry key, and the env override
    must win in both directions."""
    from jax._src import xla_bridge as xb

    cfg = tiny_pipeline_cfg()
    build = lambda: V2APipeline(cfg, t5_config=t5_tiny_test(),
                                clip_config=clip_tiny_test())

    monkeypatch.delenv("V2AP_SHIP_YUV420", raising=False)
    real = xb.backends()
    assert "axon" not in real          # CPU test env
    assert build()._ship_yuv420 is False

    monkeypatch.setattr(xb, "backends", lambda: {**real, "axon": object()})
    pipe = build()
    assert pipe._ship_yuv420 is True
    assert pipe._tower_tag.endswith("+yuv420")

    monkeypatch.setenv("V2AP_SHIP_YUV420", "0")   # override beats detection
    assert build()._ship_yuv420 is False

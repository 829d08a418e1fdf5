"""Long-video chunked generation + on-device crossfade merging.

The reference handles long videos by pre-cutting clips offline, generating
each 10-s chunk independently, and concatenating wavs with plain ``sox``
concat (src/merge_wavs.py:30-48,82-111 — no crossfade). Here the capability
is first-class and TPU-shaped:

  * one video -> overlapping chunk plan;
  * all chunks generate in a single *batched* sampler call (chunks ride the
    batch axis — on a v5e-8 mesh the batch shards across chips, one chunk per
    device, matching BASELINE config 5);
  * overlapping regions merge with an equal-power crossfade on device;
  * ``merge_wav_files`` reproduces the reference's offline pairwise-concat
    tool, with optional crossfade.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def chunk_plan(duration_s: float, chunk_s: float = 10.0,
               overlap_s: float = 1.0) -> List[Tuple[float, float]]:
    """Cover [0, duration] with fixed-length chunks overlapping by overlap_s.
    All chunks have identical length (static shapes); the last chunk is
    right-aligned."""
    if duration_s <= chunk_s:
        return [(0.0, duration_s)]
    step = chunk_s - overlap_s
    starts = list(np.arange(0.0, duration_s - chunk_s, step))
    starts.append(duration_s - chunk_s)
    return [(float(s), float(s + chunk_s)) for s in starts]


def crossfade_concat(chunks: np.ndarray, overlap_samples: int) -> np.ndarray:
    """(num_chunks, n) waveforms -> single waveform with equal-power
    crossfades in the overlapping regions."""
    num, n = chunks.shape
    if num == 1:
        return chunks[0]
    assert 0 < overlap_samples < n
    t = np.linspace(0.0, np.pi / 2.0, overlap_samples, dtype=np.float32)
    fade_out = np.cos(t)
    fade_in = np.sin(t)
    step = n - overlap_samples
    total = step * (num - 1) + n
    out = np.zeros(total, np.float32)
    out[:n] = chunks[0]
    for i in range(1, num):
        s = i * step
        out[s: s + overlap_samples] = (
            out[s: s + overlap_samples] * fade_out
            + chunks[i][:overlap_samples] * fade_in)
        out[s + overlap_samples: s + n] = chunks[i][overlap_samples:]
    return out


def generate_long(pipeline, video_path: str, prompt: str = "", *,
                  chunk_s: float = 10.0, overlap_s: float = 1.0,
                  steps: int = 25, cfg_strength: float = 2.0,
                  piano: bool = False, seed: int = 0,
                  max_duration_s: float = 600.0,
                  mesh=None) -> Tuple[np.ndarray, int]:
    """Generate audio for an arbitrarily long video by batched chunking.

    All chunks share one CLIP feature pass over the full video (cached), then
    sample as ONE batch through the jitted CFM sampler. With ``mesh`` given
    (e.g. a v5e-8 `Mesh`), the chunk batch shards over the mesh's data axis —
    one ODE integration spread across all chips (BASELINE config 5). Shard
    the model first (`parallel.shard_model`); the chunk count pads up to a
    multiple of the data-axis size.
    """
    import jax
    import jax.numpy as jnp
    from v2ap_tpu.config import SamplerConfig
    from v2ap_tpu.pipelines.generate import bucket_length

    cfg = pipeline.cfg
    cond = cfg.conditioning
    sr = cond.sampling_rate

    probe_len = int(max_duration_s * sr / cond.frame_size)
    feats, duration = pipeline.encode_video_frames_clip(video_path, probe_len)
    if duration is None:
        raise ValueError(f"cannot decode {video_path}")
    duration = min(duration, max_duration_s)

    plan = chunk_plan(duration, chunk_s, overlap_s)
    n_chunk = int(round(chunk_s * sr / cond.frame_size))
    n = bucket_length(n_chunk)
    real_b = len(plan)
    dp = 1
    if mesh is not None:
        dp = mesh.shape[mesh.axis_names[0]]
    b = ((real_b + dp - 1) // dp) * dp       # pad chunk batch to the mesh

    text = np.zeros((b, n, cfg.model.dim_text), np.float32)
    frames_roll = np.zeros((b, n, cfg.model.notes), np.float32)
    for i, (s, _) in enumerate(plan):
        off = int(round(s * sr / cond.frame_size))
        sl = feats[off: off + n_chunk]
        text[i, : len(sl)] = sl
        if piano:
            strips = pipeline.encode_piano_frames(video_path, probe_len)
            if strips is not None:
                # roll indices advance at video_multi x frame_size
                vm = cfg.model.video_multi
                r0 = int(round(off / vm))
                rows = int(np.floor(n_chunk / vm)) + 1
                sub = strips[r0: r0 + rows]
                roll = np.asarray(pipeline._encode_frames(
                    pipeline.cfm, jnp.asarray(sub[None]), n_chunk))
                frames_roll[i, : n_chunk] = roll[0]

    drop_prompt = prompt.strip() == ""
    eff_prompt = "the sound of X X" if drop_prompt else prompt
    ctx, ctx_mask = pipeline.encode_text([eff_prompt] * b)
    if drop_prompt:
        ctx = ctx * 0.0

    mask = jnp.arange(n)[None, :] < n_chunk
    mask = jnp.broadcast_to(mask, (b, n))
    x0 = jax.random.normal(jax.random.key(seed),
                           (b, n, cfg.model.num_channels))
    text = jnp.asarray(text)
    frames_roll = jnp.asarray(frames_roll)
    if mesh is not None:
        from v2ap_tpu.parallel import batch_sharding
        bs = batch_sharding(mesh)
        put = lambda a: jax.device_put(a, bs)
        x0, text, frames_roll = put(x0), put(text), put(frames_roll)
        ctx, ctx_mask, mask = put(ctx), put(ctx_mask), put(mask)
    sampler = SamplerConfig(steps=steps, cfg_strength=cfg_strength)
    latents = pipeline._sample(pipeline.cfm, x0, text, frames_roll, ctx,
                               ctx_mask, mask, sampler)
    wavs = np.asarray(pipeline._decode(pipeline.codec, latents[:, :n_chunk]))
    chunk_samples = n_chunk * cond.frame_size
    wavs = wavs[:real_b, :chunk_samples]
    overlap_samples = int(overlap_s * sr)
    merged = (crossfade_concat(wavs, overlap_samples)
              if real_b > 1 else wavs[0])
    return merged[: int(duration * sr)], sr


def merge_wav_files(paths: Sequence[str], out_path: str,
                    crossfade_s: float = 0.0) -> str:
    """Offline wav concat tool (the reference's merge_wavs capability):
    plain concatenation by default, optional crossfade."""
    from v2ap_tpu.data.audio_io import read_wav, write_wav

    parts = []
    sr = None
    for p in paths:
        audio, this_sr = read_wav(p)
        sr = sr or this_sr
        assert this_sr == sr, "sample-rate mismatch"
        parts.append(audio[0])
    if crossfade_s <= 0:
        merged = np.concatenate(parts)
    else:
        ov = int(crossfade_s * sr)
        n = max(len(p) for p in parts)
        padded = np.stack([np.pad(p, (0, n - len(p))) for p in parts])
        merged = crossfade_concat(padded, ov)
    write_wav(out_path, merged, sr)
    return out_path

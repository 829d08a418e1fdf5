"""Pre-registered quality gate for the int8-tower serving default.

int8 vision towers became the serving default in r3 on conditioning-feature
drift evidence alone (2.95% rel-rms vs f32, scripts/probe_tower_drift.py) —
the END-AUDIO impact is unmeasurable offline because the cross-condition
fusions are zero-initialised and no trained checkpoint exists here
(PARITY.md). This gate is the missing end-audio bound, registered BEFORE
real weights arrive (VERDICT r3 next #8) so the default cannot silently ride
through the moment it becomes measurable:

  * A/B: generate the same clips with bf16 towers and int8 towers (same
    seed / steps / prompt);
  * score: FAD of the int8 set against the bf16 set (Cnn14 embedder — the
    framework's built-in AudioLDM-Eval counterpart) and, when prompts are
    given, the mean CLAP-similarity delta;
  * verdict: int8 stays the default only if fad <= bound (default 1.0 — the
    north star allows 1% FAD drift vs the reference, BASELINE.md; an
    int8-vs-bf16 FAD beyond ~1.0 on Cnn14 embeddings is an audible shift);
  * the verdict is WRITTEN to a gate file that ``V2APipeline`` consults at
    construction, so a failing bound flips the default automatically —
    explicit ``quantize_towers=...`` args and V2AP_INT8_TOWERS always win.

Run it: ``python scripts/int8_tower_gate.py --ckpt <converted> --videos
tests/VGGSound/video`` once real weights are converted.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import numpy as np

DEFAULT_BOUND_FAD = 1.0


def gate_file_path() -> str:
    """Location of the persisted verdict; env V2AP_INT8_GATE_FILE overrides
    (tests point it at a tmp dir)."""
    return os.environ.get(
        "V2AP_INT8_GATE_FILE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
            __file__))), "int8_gate.json"))


def read_gate_default() -> Optional[bool]:
    """The persisted verdict, or None when the gate has never run (the
    pipeline then keeps its built-in default)."""
    path = gate_file_path()
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return bool(json.load(f)["int8_default"])
    except Exception:
        return None


def _generate_set(pipe, videos: Sequence[str], prompts: Sequence[str],
                  *, steps: int, seed: int, int8: bool):
    """One serving variant's wavs. The int8 toggle flips IN PLACE (AQT swaps
    the Linear dot_general; weights untouched), exactly like bench.py."""
    import jax.lax as lax
    from flax import nnx
    from v2ap_tpu.utils.quantize import make_int8_dot_general

    dg = make_int8_dot_general() if int8 else lax.dot_general
    for tower in pipe.towers:
        for _, node in nnx.iter_graph(tower.model):
            if isinstance(node, nnx.Linear):
                node.dot_general = dg
    wavs = []
    sr = None
    for video, prompt in zip(videos, prompts):
        wav, sr = pipe.generate(video, prompt, steps=steps, seed=seed)
        wavs.append(np.asarray(wav))
    return wavs, sr


def run_gate(pipe, videos: Sequence[str],
             prompts: Optional[Sequence[str]] = None, *,
             steps: int = 25, seed: int = 0,
             bound_fad: float = DEFAULT_BOUND_FAD,
             embedder=None, clap=None,
             write: bool = True) -> dict:
    """A/B int8 vs bf16 towers end to end; persist the verdict.

    ``embedder``/``clap`` default to the built-in Cnn14 / CLAP stacks;
    tests inject tiny ones."""
    import dataclasses

    prompts = list(prompts or [""] * len(videos))
    assert len(prompts) == len(videos) and videos, "need >=1 clip"
    # both variants must pay the towers: a warm feature cache would make
    # them identical by construction
    old_cfg = pipe.cfg
    pipe.cfg = pipe.cfg.replace(conditioning=dataclasses.replace(
        pipe.cfg.conditioning, feature_cache=False))
    try:
        t0 = time.perf_counter()
        wav_bf16, sr = _generate_set(pipe, videos, prompts, steps=steps,
                                     seed=seed, int8=False)
        wav_int8, _ = _generate_set(pipe, videos, prompts, steps=steps,
                                    seed=seed, int8=True)
    finally:
        pipe.cfg = old_cfg

    from v2ap_tpu.evaluation import metrics
    if embedder is None:
        embedder = metrics.default_embedder()
    emb_ref = np.concatenate([embedder(w, sr) for w in wav_bf16])
    emb_gen = np.concatenate([embedder(w, sr) for w in wav_int8])
    fad = metrics.fad_from_embeddings(emb_ref, emb_gen)

    clap_delta = None
    scored = [(w8, wb, p) for w8, wb, p in
              zip(wav_int8, wav_bf16, prompts) if p.strip()]
    if scored:
        if clap is None:
            from v2ap_tpu.evaluation.clap_scorer import make_clap_scorer
            clap = make_clap_scorer()
        deltas = []
        for w8, wb, p in scored:
            deltas.append(clap(_to_48k(w8, sr), p) - clap(_to_48k(wb, sr), p))
        clap_delta = float(np.mean(deltas))

    verdict = {
        "int8_default": bool(fad <= bound_fad),
        "fad_int8_vs_bf16": round(float(fad), 4),
        "bound_fad": bound_fad,
        "clap_delta": None if clap_delta is None else round(clap_delta, 4),
        "clips": len(videos), "steps": steps, "seed": seed,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    if write:
        with open(gate_file_path(), "w") as f:
            json.dump(verdict, f, indent=1)
    return verdict


def _to_48k(wav: np.ndarray, sr: int) -> np.ndarray:
    if sr == 48_000:
        return wav
    n48 = int(round(len(wav) * 48_000 / sr))
    x = np.arange(n48) * (len(wav) - 1) / max(n48 - 1, 1)
    i0 = np.floor(x).astype(np.int64)
    i1 = np.minimum(i0 + 1, len(wav) - 1)
    w = (x - i0).astype(np.float32)
    return wav[i0] * (1 - w) + wav[i1] * w

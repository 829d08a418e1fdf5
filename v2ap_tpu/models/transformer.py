"""Tri-stream DiT-style transformer backbone.

Re-design of the reference's ``Transformer`` (e2_tts_crossatt3.py:707-1143):
three parallel token streams at the latent frame rate —

  * audio  (dim 1024, 16h x 64): the flow-matching state, time-conditioned via
    AdaptiveRMSNorm + AdaLN-Zero, with a depthwise-conv positional module,
    self-attention, optional cross-attention to the T5 prompt context, GLU FF,
    and U-Net-style skip connections between the two depth halves.
  * text   (dim 1280): CLIP ViT-bigG per-frame embeddings, own attn/FF tower.
  * frames (dim 512, 8h x 64): piano-roll stream, own conv/attn/FF tower.

Per layer the three streams exchange information through zero-initialised
linear fusions (``CrossCondition``, reference :664-702). 32 learned register
tokens are prepended to every stream; RoPE per stream; the key-padding mask is
shared (registers always attend).

TPU-first choices: the layer stack is unrolled under ``jit`` (12 layers),
every attention runs the Pallas flash kernel, all matmuls in bf16 on the MXU,
norms/softmax in f32. No data-dependent control flow anywhere, so the whole
backbone traces into one XLA computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from v2ap_tpu.config import ModelConfig
from v2ap_tpu.ops import (
    AdaLNZero,
    AdaptiveRMSNorm,
    Attention,
    DepthwiseConv1d,
    GLUFeedForward,
    RMSNorm,
    TimeCondMLP,
    rope_table,
)


class CrossCondition(nnx.Module):
    """Zero-init linear fusion between the three streams.

    audio += W_a([audio,text,frames]); text += W_t([audio,text]) (disabled on
    the last text layer); frames += W_f([audio,frames]).
    """

    def __init__(self, dim: int, dim_text: int, dim_frames: int,
                 cond_audio_to_others: bool = True, *, dtype=jnp.float32,
                 rngs: nnx.Rngs):
        kw = dict(use_bias=False, kernel_init=nnx.initializers.zeros_init(),
                  dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.to_audio = nnx.Linear(dim + dim_text + dim_frames, dim, **kw)
        self.cond_audio_to_others = cond_audio_to_others
        if cond_audio_to_others:
            self.to_text = nnx.Linear(dim + dim_text, dim_text, **kw)
            self.to_frames = nnx.Linear(dim + dim_frames, dim_frames, **kw)

    def __call__(self, audio, text, frames):
        atf = jnp.concatenate([audio, text, frames], axis=-1)
        audio_out = audio + self.to_audio(atf)
        if self.cond_audio_to_others:
            at = jnp.concatenate([audio, text], axis=-1)
            af = jnp.concatenate([audio, frames], axis=-1)
            text = text + self.to_text(at)
            frames = frames + self.to_frames(af)
        return audio_out, text, frames


class StreamBlock(nnx.Module):
    """conv? -> attn -> ff tower for the text / frames streams (plain RMSNorm)."""

    def __init__(self, dim: int, heads: int, dim_head: int, ff_mult: int,
                 kernel_size: int, use_conv: bool, cfg: ModelConfig, *,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv = (DepthwiseConv1d(dim, kernel_size, dtype=dtype, rngs=rngs)
                     if use_conv else None)
        self.attn_norm = RMSNorm(dim, rngs=rngs)
        self.attn = Attention(
            dim, heads, dim_head, dropout=cfg.dropout,
            gate_value_heads=cfg.gate_value_heads,
            softclamp_logits=cfg.softclamp_logits,
            softclamp_value=cfg.softclamp_value,
            dtype=dtype, rngs=rngs)
        self.ff_norm = RMSNorm(dim, rngs=rngs)
        self.ff = GLUFeedForward(dim, ff_mult, cfg.dropout, dtype=dtype, rngs=rngs)

    def __call__(self, x, *, rotary, mask, deterministic=True):
        if self.conv is not None:
            x = self.conv(x, mask=mask) + x
        x = self.attn(self.attn_norm(x), rotary=rotary, mask=mask,
                      deterministic=deterministic) + x
        x = self.ff(self.ff_norm(x), deterministic=deterministic) + x
        return x


class AudioBlock(nnx.Module):
    """Time-conditioned audio-stream block with skip merge, conv, self-attn,
    cross-attn (T5 context) and FF — residual order per reference :1106-1137."""

    def __init__(self, cfg: ModelConfig, is_later_half: bool, *,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        dim = cfg.dim
        self.skip_proj = (
            nnx.Linear(dim * 2, dim, use_bias=False, dtype=dtype,
                       param_dtype=jnp.float32, rngs=rngs)
            if is_later_half else None)
        self.conv = (DepthwiseConv1d(dim, cfg.kernel_size, dtype=dtype, rngs=rngs)
                     if cfg.if_audio_conv else None)

        attn_kw = dict(dropout=cfg.dropout, gate_value_heads=cfg.gate_value_heads,
                       softclamp_logits=cfg.softclamp_logits,
                       softclamp_value=cfg.softclamp_value, dtype=dtype, rngs=rngs)
        self.attn_norm = AdaptiveRMSNorm(dim, rngs=rngs)
        self.attn = Attention(dim, cfg.heads, cfg.dim_head, **attn_kw)
        self.attn_gate = AdaLNZero(dim, rngs=rngs)
        if cfg.if_cross_attn:
            self.cross_norm = AdaptiveRMSNorm(dim, rngs=rngs)
            self.cross_attn = Attention(dim, cfg.heads, cfg.dim_head,
                                        dim_context=cfg.dim_context,
                                        cross_attention=True, **attn_kw)
            self.cross_gate = AdaLNZero(dim, rngs=rngs)
            # with context=None x_transformers' attn2 degrades to rotary
            # self-attention over x — only expressible when the context
            # projections accept dim-wide input. Reference configs always
            # have dim_context == dim (T5-large hidden 1024 == dim 1024);
            # dim_context != dim is a framework generalization where the
            # degenerate path cannot arise, so it is skipped instead.
            self.cross_self_ok = cfg.dim_context == dim
        else:
            self.cross_attn = None
            self.cross_self_ok = False
        self.ff_norm = AdaptiveRMSNorm(dim, rngs=rngs)
        self.ff = GLUFeedForward(dim, cfg.ff_mult, cfg.dropout, dtype=dtype, rngs=rngs)
        self.ff_gate = AdaLNZero(dim, rngs=rngs)

    def cond_projections(self):
        """The block's time-cond projection-owning modules in slot order
        (for the fused stacked matmul; the caller reads each module's own
        projection weights/bias). Gammas precomputed in this order feed
        ``__call__(gammas=...)``."""
        mods = [self.attn_norm, self.attn_gate]
        if self.cross_attn is not None:
            mods += [self.cross_norm, self.cross_gate]
        mods += [self.ff_norm, self.ff_gate]
        return mods

    def __call__(self, x, skip, *, cond, rotary, mask, context, context_mask,
                 deterministic=True, gammas=None):
        if self.skip_proj is not None:
            x = self.skip_proj(jnp.concatenate([x, skip], axis=-1))
        if self.conv is not None:
            x = self.conv(x, mask=mask) + x
        # gammas: (b, n_slots, dim) raw cond projections precomputed by the
        # transformer's fused stacked matmul; None = project per sub-op.
        g = (lambda i: gammas[:, i]) if gammas is not None else (lambda i: None)
        attn_out = self.attn(self.attn_norm(x, condition=cond, gamma=g(0)),
                             rotary=rotary,
                             mask=mask, deterministic=deterministic)
        x = x + self.attn_gate(attn_out, condition=cond, gamma=g(1))
        slot = 2
        if self.cross_attn is not None and (context is not None
                                            or self.cross_self_ok):
            # context=None is NOT a skip: the reference always runs attn2
            # (e2_tts_crossatt3.py:1131), and x_transformers' Attention with
            # no context degrades to rotary SELF-attention over x — the
            # prompt=None sample() path. The checkpoint converter permutes
            # these q/k rows for the rope convention; a shared permutation
            # cancels in the with-context (no-rope) case. Dropped/empty
            # prompts are a ZEROED context (reference :2058-2062), not None.
            cross_out = self.cross_attn(
                self.cross_norm(x, condition=cond, gamma=g(2)), rotary=rotary,
                mask=mask, context=context, context_mask=context_mask,
                deterministic=deterministic)
            x = x + self.cross_gate(cross_out, condition=cond, gamma=g(3))
        if self.cross_attn is not None:
            slot = 4
        ff_out = self.ff(self.ff_norm(x, condition=cond, gamma=g(slot)),
                         deterministic=deterministic)
        x = x + self.ff_gate(ff_out, condition=cond, gamma=g(slot + 1))
        return x


def _layer_fwd(text_block, frames_block, cross_cond, audio_block,
               x, text_embed, frames_embed, skip, cond, gammas,
               rot_audio, rot_text, rot_frames, mask, context, context_mask,
               deterministic, collect):
    """One tri-stream layer (text/frames towers -> cross-condition fusion ->
    audio block). Factored out of the depth loop so training can wrap it in
    ``nnx.remat``: full-size training (12x1024, f32 AdamW state) does not fit
    one chip's HBM with all activations saved. Returns the post-fusion
    ``x_mid`` too — the U-Net skip source (reference :1108-1117)."""
    collected = ()
    if text_block is not None:
        text_embed = text_block(text_embed, rotary=rot_text, mask=mask,
                                deterministic=deterministic)
        frames_embed = frames_block(frames_embed, rotary=rot_frames,
                                    mask=mask, deterministic=deterministic)
        if collect:
            collected = (x, text_embed)
        x, text_embed, frames_embed = cross_cond(x, text_embed, frames_embed)
    x_mid = x
    x = audio_block(x, skip, cond=cond, rotary=rot_audio, mask=mask,
                    context=context, context_mask=context_mask,
                    deterministic=deterministic, gammas=gammas)
    return x, text_embed, frames_embed, x_mid, collected


_layer_fwd_remat = nnx.remat(_layer_fwd, static_argnums=(16, 17))
_layer_fwd_remat_dots = nnx.remat(
    _layer_fwd, static_argnums=(16, 17),
    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)


class TriStreamTransformer(nnx.Module):
    def __init__(self, cfg: ModelConfig, *, rngs: nnx.Rngs):
        assert cfg.depth % 2 == 0, "depth must be even for U-Net skips"
        assert 1 <= cfg.text_depth <= cfg.depth
        self.cfg = cfg
        dtype = jnp.dtype(cfg.dtype)
        self.dtype = dtype

        init_reg = nnx.initializers.normal(stddev=0.02)
        self.registers = nnx.Param(init_reg(rngs.params(), (cfg.num_registers, cfg.dim)))
        self.text_registers = nnx.Param(
            init_reg(rngs.params(), (cfg.num_registers, cfg.dim_text)))
        self.frames_registers = nnx.Param(
            init_reg(rngs.params(), (cfg.num_registers, cfg.dim_frames)))

        self.abs_pos_emb = (
            nnx.Embed(cfg.max_seq_len, cfg.dim, param_dtype=jnp.float32,
                      dtype=dtype, rngs=rngs)
            if cfg.abs_pos_emb else None)

        self.time_mlp = TimeCondMLP(cfg.dim, rngs=rngs)

        self.audio_blocks = nnx.List()
        self.text_blocks = nnx.List()
        self.frames_blocks = nnx.List()
        self.cross_conditions = nnx.List()
        for ind in range(cfg.depth):
            is_later_half = ind >= cfg.depth // 2
            self.audio_blocks.append(
                AudioBlock(cfg, is_later_half, dtype=dtype, rngs=rngs))
            has_text = ind < cfg.text_depth
            if has_text:
                self.text_blocks.append(StreamBlock(
                    cfg.dim_text, cfg.text_heads, cfg.text_dim_head,
                    cfg.text_ff_mult, cfg.kernel_size, cfg.if_text_conv, cfg,
                    dtype=dtype, rngs=rngs))
                is_last_text = ind == cfg.text_depth - 1
                self.cross_conditions.append(CrossCondition(
                    cfg.dim, cfg.dim_text, cfg.dim_frames,
                    cond_audio_to_others=not is_last_text, dtype=dtype, rngs=rngs))
            else:
                self.text_blocks.append(None)
                self.cross_conditions.append(None)
            # frames tower exists at every depth (reference :910-927)
            self.frames_blocks.append(StreamBlock(
                cfg.dim_frames, cfg.frames_heads, cfg.frames_dim_head,
                cfg.frames_ff_mult, cfg.kernel_size, True, cfg,
                dtype=dtype, rngs=rngs))

        self.final_norm = RMSNorm(cfg.dim, rngs=rngs)

    def _fused_cond_gammas(self, cond: jnp.ndarray) -> jnp.ndarray:
        """All audio layers' time-cond projections as ONE stacked matmul.

        Every AudioBlock owns 6 (4 without cross-attn) zero-init Linear(dim →
        dim) projections of the SAME per-batch ``cond`` (the reference
        projects per sub-op inside each layer, e2_tts_crossatt3.py:38-45 +
        532-551). Stacking the kernels into (dim, depth*slots*dim) turns
        depth*slots tiny MXU-starved matmuls — recomputed once more per layer
        under remat — into one well-shaped matmul whose (b, slots, dim)
        per-layer outputs are cheap saved residuals. Identical math; norms
        apply (+1), gates apply sigmoid, downstream.

        Returns (depth, b, slots, dim) float32 raw projections.
        """
        mods = [blk.cond_projections() for blk in self.audio_blocks]
        slots = len(mods[0])
        dim = self.cfg.dim
        kernel = jnp.concatenate(
            [m.to_gamma.kernel[...] for layer in mods for m in layer], axis=1)
        bias = jnp.concatenate([
            m.to_gamma.bias[...] if getattr(m.to_gamma, "bias", None) is not None
            else jnp.zeros((dim,), jnp.float32)
            for layer in mods for m in layer])
        g = cond.astype(jnp.float32) @ kernel + bias      # (b, depth*slots*dim)
        g = g.reshape(cond.shape[0], len(mods), slots, dim)
        return jnp.transpose(g, (1, 0, 2, 3))             # (depth, b, slots, dim)

    def __call__(
        self,
        x: jnp.ndarray,                      # (b, n, dim) projected latents
        *,
        times: jnp.ndarray,                  # (b,) flow time in [0, 1]
        mask: jnp.ndarray | None,            # (b, n) True == valid
        text_embed: jnp.ndarray,             # (b, n, dim_text)
        frames_embed: jnp.ndarray,           # (b, n, dim_frames)
        context: jnp.ndarray | None = None,        # (b, nc, dim_context)
        context_mask: jnp.ndarray | None = None,   # (b, nc)
        deterministic: bool = True,
        collect_hidden_layer: int | None = None,   # 1-based; for FactorCL
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, n, _ = x.shape
        r = cfg.num_registers

        if self.abs_pos_emb is not None:
            assert n <= cfg.max_seq_len, f"{n} > max_seq_len {cfg.max_seq_len}"
            x = x + self.abs_pos_emb(jnp.arange(n))

        cond = self.time_mlp(times)           # (b, dim)

        # prepend registers to all streams; extend mask with True
        tile = lambda p: jnp.broadcast_to(p[...][None], (b, r, p[...].shape[-1])).astype(x.dtype)
        x = jnp.concatenate([tile(self.registers), x], axis=1)
        text_embed = jnp.concatenate(
            [tile(self.text_registers), text_embed.astype(x.dtype)], axis=1)
        frames_embed = jnp.concatenate(
            [tile(self.frames_registers), frames_embed.astype(x.dtype)], axis=1)
        if mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((b, r), bool), mask.astype(bool)], axis=1)

        total = n + r
        # the reference builds all three per-stream RotaryEmbedding(dim_head)
        # from the AUDIO head width (e2_tts_crossatt3.py:777-781), so a
        # stream with wider heads (frames: 8x64) gets PARTIAL rotary when
        # dim_head < frames_dim_head. (A stream with NARROWER heads would
        # crash the reference's apply_rotary_pos_emb on a shape mismatch, so
        # clamp to the stream width — only unrealizable tiny test configs hit
        # this.) Identical tables are shared.
        rot_audio = rope_table(total, cfg.dim_head)
        clamp = lambda d: (rot_audio if d >= cfg.dim_head
                           else rope_table(total, d))
        rot_text = clamp(cfg.text_dim_head)
        rot_frames = clamp(cfg.frames_dim_head)

        skips = []
        collected = None
        layer_fn = _layer_fwd
        if cfg.remat:
            layer_fn = (_layer_fwd_remat_dots if cfg.remat_policy == "dots"
                        else _layer_fwd_remat)
        all_gammas = (self._fused_cond_gammas(cond)
                      if cfg.fused_adaln else None)
        for ind in range(cfg.depth):
            text_block = self.text_blocks[ind]
            has_towers = text_block is not None
            layer = ind + 1
            skip = None if layer <= cfg.depth // 2 else skips.pop()
            # FactorCL tap: (audio, clip-stream) hiddens before the
            # cross-condition fusion (reference e2_tts_crossatt6.py
            # contrastive block at layer 1)
            collect = collect_hidden_layer == layer and has_towers
            x, text_embed, frames_embed, x_mid, col = layer_fn(
                text_block,
                self.frames_blocks[ind] if has_towers else None,
                self.cross_conditions[ind] if has_towers else None,
                self.audio_blocks[ind],
                x, text_embed, frames_embed, skip, cond,
                None if all_gammas is None else all_gammas[ind],
                rot_audio, rot_text, rot_frames, mask, context, context_mask,
                deterministic, collect)
            if layer <= cfg.depth // 2:
                skips.append(x_mid)
            if collect:
                collected = col

        assert not skips
        x = x[:, r:]
        out = self.final_norm(x)
        if collect_hidden_layer is not None:
            return out, collected
        return out

"""Video2Roll piano-perception network in JAX (NHWC, XLA convs).

Behavioral re-implementation of the Audeo ResNet18+FPN model the reference
embeds for the piano branch (reference: src/audeo/Video2RollNet.py:127-257):
5 stacked grayscale keyboard frames (5, 100, 900) -> 51 key logits.

Structure: 11x11/2 stem -> 4 BasicBlock stages -> feature-transform blocks
(FTB: 1x1 conv with pad-1 + residual 3x3s + avg-pool) aligning stages 2-4 to a
common 4x29 grid -> feature-refinement gates (FRB: squeeze-excite across two
stages) -> attention-style fusion p2*p3 -> spatial softmax -> *p4 -> head.

Convs/pools are plain XLA ops (this net is a tiny fraction of step FLOPs; the
MXU eats these convs without custom kernels). Layout is NHWC, TPU's native
conv layout. BatchNorm carries running stats for train/eval parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from flax import nnx


def _avg_pool(x, k, s):
    # x: (b, h, w, c) -> VALID average pooling
    out = lax.reduce_window(x, 0.0, lax.add, (1, k, k, 1), (1, s, s, 1), "VALID")
    return out / float(k * k)


def _max_pool(x, k, s, pad):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1),
        ((0, 0), (pad, pad), (pad, pad), (0, 0)))


class ConvBN(nnx.Module):
    def __init__(self, cin, cout, k, stride=1, pad=0, use_bias=False, *,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv = nnx.Conv(cin, cout, (k, k), strides=(stride, stride),
                             padding=((pad, pad), (pad, pad)), use_bias=use_bias,
                             dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.bn = nnx.BatchNorm(cout, use_running_average=True, dtype=jnp.float32,
                                param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x, train: bool = False):
        return self.bn(self.conv(x), use_running_average=not train)


class BasicBlock(nnx.Module):
    def __init__(self, cin, cout, stride=1, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.cb1 = ConvBN(cin, cout, 3, stride, 1, dtype=dtype, rngs=rngs)
        self.cb2 = ConvBN(cout, cout, 3, 1, 1, dtype=dtype, rngs=rngs)
        self.down = (ConvBN(cin, cout, 1, stride, 0, dtype=dtype, rngs=rngs)
                     if (stride != 1 or cin != cout) else None)

    def __call__(self, x, train: bool = False):
        res = self.down(x, train) if self.down is not None else x
        h = nnx.relu(self.cb1(x, train))
        h = self.cb2(h, train)
        return nnx.relu(h + res)


class FTB(nnx.Module):
    """Feature-transform block: 1x1 conv with pad 1 (grows H,W by 2), residual
    3x3 pair with BN, then avg-pool (k2/s2 when ``avg`` else k3/s1)."""

    def __init__(self, cin, cout, *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv0 = nnx.Conv(cin, cout, (1, 1), padding=((1, 1), (1, 1)),
                              use_bias=False, dtype=dtype,
                              param_dtype=jnp.float32, rngs=rngs)
        self.cb1 = ConvBN(cout, cout, 3, 1, 1, dtype=dtype, rngs=rngs)
        self.conv2 = nnx.Conv(cout, cout, (3, 3), padding=((1, 1), (1, 1)),
                              use_bias=False, dtype=dtype,
                              param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x, avg: bool = True, train: bool = False):
        x1 = self.conv0(x)
        h = nnx.relu(self.cb1(x1, train))
        h = self.conv2(h) + x1
        return _avg_pool(h, 2, 2) if avg else _avg_pool(h, 3, 1)


class FRB(nnx.Module):
    """Feature-refine block: squeeze-excite gate over concat(xl, xh) -> xl."""

    def __init__(self, ch_h, ch_l, *, dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.fc1 = nnx.Linear(ch_h + ch_l, ch_l, **kw)
        self.fc2 = nnx.Linear(ch_l, ch_l, **kw)

    def __call__(self, xl, xh):
        xc = jnp.concatenate([xl, xh], axis=-1)
        z = jnp.mean(xc, axis=(1, 2))                    # global avg pool
        z = nnx.sigmoid(self.fc2(nnx.relu(self.fc1(z))))
        return xl * z[:, None, None, :]


class Video2RollNet(nnx.Module):
    def __init__(self, num_classes: int = 51, in_frames: int = 5, *,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.dtype = dtype
        self.stem = ConvBN(in_frames, 64, 11, 2, 4, dtype=dtype, rngs=rngs)
        mk = lambda cin, cout, stride: nnx.List([
            BasicBlock(cin, cout, stride, dtype=dtype, rngs=rngs),
            BasicBlock(cout, cout, 1, dtype=dtype, rngs=rngs)])
        self.layer1 = mk(64, 64, 1)
        self.layer2 = mk(64, 128, 2)
        self.layer3 = mk(128, 256, 2)
        self.layer4 = mk(256, 512, 2)

        self.ftb2_1 = FTB(128, 128, dtype=dtype, rngs=rngs)
        self.ftb2_2 = FTB(128, 128, dtype=dtype, rngs=rngs)
        self.ftb3 = FTB(256, 128, dtype=dtype, rngs=rngs)
        self.ftb4 = FTB(512, 128, dtype=dtype, rngs=rngs)

        self.toplayer = ConvBN(512, 64, 1, 1, 0, use_bias=True, dtype=dtype,
                               rngs=rngs)
        self.frb4 = FRB(64, 128, dtype=dtype, rngs=rngs)
        self.frb3 = FRB(128, 128, dtype=dtype, rngs=rngs)
        self.frb2 = FRB(128, 128, dtype=dtype, rngs=rngs)

        self.conv2 = nnx.Conv(128, 128, (1, 1), dtype=dtype,
                              param_dtype=jnp.float32, rngs=rngs)
        self.fc = nnx.Linear(128, num_classes, dtype=dtype,
                             param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: (b, frames=5, H, W) grayscale stack -> (b, num_classes) logits."""
        x = x.astype(self.dtype).transpose(0, 2, 3, 1)   # NHWC, frames as C
        h = nnx.relu(self.stem(x, train))
        h = _max_pool(h, 3, 2, 1)
        for blk in self.layer1:
            h = blk(h, train)
        x2 = h
        for blk in self.layer2:
            x2 = blk(x2, train)
        x3 = x2
        for blk in self.layer3:
            x3 = blk(x3, train)
        x4 = x3
        for blk in self.layer4:
            x4 = blk(x4, train)

        x5 = nnx.relu(self.toplayer(x4, train))
        x2_ = self.ftb2_2(self.ftb2_1(x2, train=train), train=train)
        x3_ = self.ftb3(x3, train=train)
        x4_ = self.ftb4(x4, avg=False, train=train)

        p4 = self.frb4(x4_, x5)
        p3 = self.frb3(x3_, p4)
        p2 = self.frb2(x2_, p3)

        out1 = p2 * p3
        b, hh, ww, cc = out1.shape
        flat = out1.reshape(b, hh * ww, cc).astype(jnp.float32)
        att = jax.nn.softmax(flat, axis=1).reshape(b, hh, ww, cc).astype(out1.dtype)
        out2 = self.conv2(att * p4)
        out = out2 + p4
        pooled = jnp.mean(out, axis=(1, 2))
        return self.fc(pooled).astype(jnp.float32)


def upsample_strips_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Linear 2x upsample along the key axis (last dim) — the device half of
    the 2:1 strip-shipping mode (data/video_io.pack_strips_half packs on
    host). Standard half-pixel-centre mapping: output j reads source
    position (j + 0.5)/2 - 0.5, edge-clamped. Gather indices are trace-time
    constants, so this compiles to two gathers + one fma."""
    w2 = x.shape[-1]
    pos = jnp.clip((jnp.arange(2 * w2) + 0.5) / 2.0 - 0.5, 0.0, w2 - 1.0)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, w2 - 1)
    w = (pos - i0).astype(x.dtype)
    return x[..., i0] * (1.0 - w) + x[..., i1] * w

"""Roll2Midi GAN: cleans estimated piano-roll probability windows into crisp
MIDI activations (Audeo stage 2; reference: src/audeo/Roll2MidiNet.py and
Roll2MidiNet_enhance.py).

Architecture notes (behavioral parity): the "U-Net" is stride-1 throughout —
spatial dims never change; it is a deep conv stack whose decoder concatenates
encoder features channel-wise. Down blocks: 3x3 conv (no bias) + BatchNorm
(eps 0.8 — the reference passes 0.8 as the positional eps arg) + LeakyReLU0.2
+ dropout. Up blocks: 3x3 "transposed" conv (stride 1 == ordinary conv with a
flipped kernel) + BN + ReLU, then skip concat. Head: 1x1 conv + sigmoid. The
discriminator is a LSGAN PatchGAN (3 stride-2 blocks + 1 stride-1,
InstanceNorm). The enhance variant inserts additive attention gates on the
decoder skips.

NHWC layout; roll windows are (b, keys, frames, 1) here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx


class DownBlock(nnx.Module):
    def __init__(self, cin, cout, normalize=True, dropout=0.0, *,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.conv = nnx.Conv(cin, cout, (3, 3), padding=((1, 1), (1, 1)),
                             use_bias=False, dtype=dtype,
                             param_dtype=jnp.float32, rngs=rngs)
        self.bn = (nnx.BatchNorm(cout, epsilon=0.8, use_running_average=True,
                                 dtype=jnp.float32, param_dtype=jnp.float32,
                                 rngs=rngs)
                   if normalize else None)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout else None

    def __call__(self, x, train=False, deterministic=True):
        h = self.conv(x)
        if self.bn is not None:
            h = self.bn(h, use_running_average=not train)
        h = nnx.leaky_relu(h, 0.2)
        if self.dropout is not None:
            h = self.dropout(h, deterministic=deterministic)
        return h


class UpBlock(nnx.Module):
    def __init__(self, cin, cout, dropout=0.0, *, dtype=jnp.float32,
                 rngs: nnx.Rngs):
        # stride-1 k3 "transposed" conv == plain conv (kernel flip only
        # matters for weight conversion)
        self.conv = nnx.Conv(cin, cout, (3, 3), padding=((1, 1), (1, 1)),
                             use_bias=False, dtype=dtype,
                             param_dtype=jnp.float32, rngs=rngs)
        self.bn = nnx.BatchNorm(cout, epsilon=0.8, use_running_average=True,
                                dtype=jnp.float32, param_dtype=jnp.float32,
                                rngs=rngs)
        self.dropout = nnx.Dropout(dropout, rngs=rngs) if dropout else None

    def __call__(self, x, skip, train=False, deterministic=True):
        h = nnx.relu(self.bn(self.conv(x), use_running_average=not train))
        if self.dropout is not None:
            h = self.dropout(h, deterministic=deterministic)
        return jnp.concatenate([h, skip], axis=-1)


class AttentionGate(nnx.Module):
    """Additive attention gate (enhance variant,
    Roll2MidiNet_enhance.py:41-55)."""

    def __init__(self, cin, cg, cout, *, dtype=jnp.float32, rngs: nnx.Rngs):
        kw = dict(dtype=dtype, param_dtype=jnp.float32, rngs=rngs)
        self.theta_x = nnx.Conv(cin, cout, (1, 1), **kw)
        self.phi_g = nnx.Conv(cg, cout, (1, 1), **kw)
        self.psi = nnx.Conv(cout, 1, (1, 1), **kw)

    def __call__(self, x, g):
        alpha = nnx.sigmoid(self.psi(self.theta_x(x) + self.phi_g(g)))
        return x * alpha


class Roll2MidiGenerator(nnx.Module):
    def __init__(self, channels: int = 1, enhance: bool = False, *,
                 dtype=jnp.float32, rngs: nnx.Rngs):
        self.enhance = enhance
        kw = dict(dtype=dtype, rngs=rngs)
        self.down1 = DownBlock(channels, 64, normalize=False, **kw)
        self.down2 = DownBlock(64, 128, **kw)
        self.down3 = DownBlock(128, 256, dropout=0.5, **kw)
        self.down4 = DownBlock(256, 512, dropout=0.5, **kw)
        self.down5 = DownBlock(512, 1024, dropout=0.5, **kw)
        self.down6 = DownBlock(1024, 1024, dropout=0.5, **kw)
        if not enhance:
            self.up1 = UpBlock(1024, 512, dropout=0.5, **kw)
            self.up2 = UpBlock(1024 + 512, 256, dropout=0.5, **kw)
            self.up3 = UpBlock(512 + 256, 128, **kw)
            self.up4 = UpBlock(256 + 128, 64, **kw)
            self.up5 = UpBlock(128 + 64, 16, **kw)
            head_in = 80
        else:
            self.att1 = AttentionGate(2048, 1024, 512, **kw)
            self.att2 = AttentionGate(1024, 512, 256, **kw)
            self.att3 = AttentionGate(512, 256, 128, **kw)
            self.att4 = AttentionGate(256, 128, 64, **kw)
            self.up1 = UpBlock(1024, 1024, dropout=0.5, **kw)
            self.up2 = UpBlock(2048, 512, dropout=0.5, **kw)
            self.up3 = UpBlock(1024, 256, **kw)
            self.up4 = UpBlock(512, 128, **kw)
            self.up5 = UpBlock(256, 64, **kw)
            head_in = 128
        self.head = nnx.Conv(head_in, 1, (1, 1), dtype=dtype,
                             param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x, train=False, deterministic=True):
        """x: (b, keys, frames, 1) roll probabilities -> same-shape sigmoid."""
        kw = dict(train=train, deterministic=deterministic)
        d1 = self.down1(x, **kw)
        d2 = self.down2(d1, **kw)
        d3 = self.down3(d2, **kw)
        d4 = self.down4(d3, **kw)
        d5 = self.down5(d4, **kw)
        d6 = self.down6(d5, **kw)
        if not self.enhance:
            u = self.up1(d6, d5, **kw)
            u = self.up2(u, d4, **kw)
            u = self.up3(u, d3, **kw)
            u = self.up4(u, d2, **kw)
            u = self.up5(u, d1, **kw)
        else:
            u = self.att1(self.up1(d6, d5, **kw), d5)
            u = self.att2(self.up2(u, d4, **kw), d4)
            u = self.att3(self.up3(u, d3, **kw), d3)
            u = self.att4(self.up4(u, d2, **kw), d2)
            u = self.up5(u, d1, **kw)
        return nnx.sigmoid(self.head(u).astype(jnp.float32))


class _InstanceNorm(nnx.Module):
    def __init__(self, eps: float = 1e-5):
        self.eps = eps

    def __call__(self, x):
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class Roll2MidiDiscriminator(nnx.Module):
    """LSGAN PatchGAN over roll windows (reference Roll2MidiNet.py:90-120)."""

    def __init__(self, channels: int = 1, height: int = 51, width: int = 100,
                 *, dtype=jnp.float32, rngs: nnx.Rngs):
        self.output_shape = (height // 8 + 1, width // 8 + 1, 1)
        specs = [(64, 2, False), (128, 2, True), (256, 2, True), (512, 1, True)]
        self.convs = nnx.List()
        self.norms = nnx.List()
        cin = channels
        for cout, stride, normalize in specs:
            self.convs.append(nnx.Conv(
                cin, cout, (3, 3), strides=(stride, stride),
                padding=((1, 1), (1, 1)), dtype=dtype,
                param_dtype=jnp.float32, rngs=rngs))
            self.norms.append(_InstanceNorm() if normalize else None)
            cin = cout
        self.head = nnx.Conv(cin, 1, (3, 3), padding=((1, 1), (1, 1)),
                             dtype=dtype, param_dtype=jnp.float32, rngs=rngs)

    def __call__(self, x):
        for conv, norm in zip(self.convs, self.norms):
            x = conv(x)
            if norm is not None:
                x = norm(x)
            x = nnx.leaky_relu(x, 0.2)
        return self.head(x).astype(jnp.float32)

"""Packed-activation U-Net/Generator (lane-occupancy optimized).

Numerically equivalent to models.unet.SimpleUNet / GeneratorUNet — same
topology, same parameter tree (module/param names mirror the standard
classes, so params are interchangeable) — but activations stay in the
W-packed layout of ops.packedconv (minor dim = 8*C = full 128 lanes at
C=16) through entire conv blocks. Device traces showed ~35% of the GAN
epoch in layout copies between XLA's conv and matmul layouts; packing
removes the relayouts inside blocks (pack/unpack remain only around
ConvTranspose and at the network boundary).

Requires the input width to divide 32 (8-packing at full resolution and
after two 2x pools); methods.neural pads spectrograms accordingly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet import BN_MOMENTUM
from ..ops.packedconv import (B, channel_affine_packed, channel_stats_packed,
                              conv1x1_packed, conv3x3_packed_auto,
                              conv3x3_packed2_auto, conv4x4s2_packed_auto,
                              conv_transpose2x2_packed_auto,
                              max_pool_2x2_packed, pack, unpack)


class PackedConv3x3(nn.Module):
    """Param-compatible with models.unet.Conv3x3 (kernel HWIO + bias).

    in_features is explicit because packed lanes hide Ci; ``split`` > 0
    treats the input as the channel-concat of two packed tensors (skip
    connections) without materializing the concat.
    """

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, xp2=None, split: int = 0):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        x = xp.astype(self.dtype)
        if xp2 is None:
            y = conv3x3_packed_auto(x, kernel)
        else:
            y = conv3x3_packed2_auto(x, xp2.astype(self.dtype),
                                     kernel[:, :, :split], kernel[:, :, split:])
        return y + jnp.tile(bias, B).astype(y.dtype)[None, None, None, :]


class PackedBatchNorm(nn.Module):
    """nn.BatchNorm semantics (momentum 0.9, eps 1e-5, biased variance) on
    packed activations; same param/batch_stats tree (scale/bias, mean/var).
    Always reduces in f32 (bf16 stats destabilize the GAN loop)."""

    channels: int
    momentum: float = BN_MOMENTUM
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xp, train: bool = True):
        c = self.channels
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,), jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,), jnp.float32)
        if train:
            # stats reduce in f32 (the upcast fuses into the reduction; no
            # f32 copy of the activation is materialized)
            mean, var = channel_stats_packed(xp, c)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = scale * jax.lax.rsqrt(var + self.epsilon)
        # apply in the input's dtype: under bf16 this keeps the activation
        # bf16 end-to-end (halves BN traffic); f32 runs are unchanged
        return channel_affine_packed(xp, mul, bias - mean * mul)


class PackedConvBlock(nn.Module):
    """ConvBlock twin: 2x (conv3x3 + ReLU), packed throughout."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, xp2=None, split: int = 0):
        x = PackedConv3x3(self.features, self.in_features, self.dtype,
                          name="Conv3x3_0")(xp, xp2, split)
        x = nn.relu(x)
        x = PackedConv3x3(self.features, self.features, self.dtype,
                          name="Conv3x3_1")(x)
        return nn.relu(x)


class PackedBNLeakyConvBlock(nn.Module):
    """BNLeakyConvBlock twin: 2x (conv3x3 + BN + LeakyReLU 0.2), packed."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, train: bool = True, xp2=None, split: int = 0):
        x = PackedConv3x3(self.features, self.in_features, self.dtype,
                          name="Conv3x3_0")(xp, xp2, split)
        x = PackedBatchNorm(self.features, name="BatchNorm_0")(x, train)
        x = nn.leaky_relu(x, 0.2)
        x = PackedConv3x3(self.features, self.features, self.dtype,
                          name="Conv3x3_1")(x)
        x = PackedBatchNorm(self.features, name="BatchNorm_1")(x, train)
        return nn.leaky_relu(x, 0.2)


class PackedConvTranspose2x2(nn.Module):
    """nn.ConvTranspose(co, (2,2), strides=(2,2)) twin on packed
    activations (param tree: kernel (2,2,Ci,Co) + bias)."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xp):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = conv_transpose2x2_packed_auto(xp.astype(self.dtype),
                                          kernel.astype(self.dtype))
        return y + jnp.tile(bias, B).astype(y.dtype)[None, None, None, :]


class _PackedOut1x1(nn.Module):
    """nn.Conv(1, (1,1)) twin on packed input (param tree: kernel/bias)."""

    in_features: int

    @nn.compact
    def __call__(self, xp):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, 1), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (1,), jnp.float32)
        y = conv1x1_packed(xp.astype(jnp.float32), kernel[0, 0])
        return y + jnp.tile(bias, B)[None, None, None, :]


class PackedSimpleUNet(nn.Module):
    """SimpleUNet twin. (N, F, T, 1) -> (N, F, T, 1); F % 4 == 0,
    T % 32 == 0 (8-packing through two pools)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        up32 = PackedConvTranspose2x2(32, 64, dt, name="ConvTranspose_0")
        up16 = PackedConvTranspose2x2(16, 32, dt, name="ConvTranspose_1")
        xp = pack(x)
        e1 = PackedConvBlock(16, 1, dt, name="ConvBlock_0")(xp)
        e2 = PackedConvBlock(32, 16, dt, name="ConvBlock_1")(
            max_pool_2x2_packed(e1, 16))
        b = PackedConvBlock(64, 32, dt, name="ConvBlock_2")(
            max_pool_2x2_packed(e2, 32))
        d2 = PackedConvBlock(32, 64, dt, name="ConvBlock_3")(e2, up32(b), 32)
        d1 = PackedConvBlock(16, 32, dt, name="ConvBlock_4")(e1, up16(d2), 16)
        out = _PackedOut1x1(16, name="Conv_0")(d1)
        return unpack(out, 1)


class PackedGeneratorUNet(nn.Module):
    """GeneratorUNet twin: BN + LeakyReLU blocks, tanh output, packed."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        up32 = PackedConvTranspose2x2(32, 64, dt, name="ConvTranspose_0")
        up16 = PackedConvTranspose2x2(16, 32, dt, name="ConvTranspose_1")
        xp = pack(x)
        e1 = PackedBNLeakyConvBlock(16, 1, dt, name="BNLeakyConvBlock_0")(
            xp, train)
        e2 = PackedBNLeakyConvBlock(32, 16, dt, name="BNLeakyConvBlock_1")(
            max_pool_2x2_packed(e1, 16), train)
        b = PackedBNLeakyConvBlock(64, 32, dt, name="BNLeakyConvBlock_2")(
            max_pool_2x2_packed(e2, 32), train)
        d2 = PackedBNLeakyConvBlock(32, 64, dt, name="BNLeakyConvBlock_3")(
            e2, train, up32(b), 32)
        d1 = PackedBNLeakyConvBlock(16, 32, dt, name="BNLeakyConvBlock_4")(
            e1, train, up16(d2), 16)
        out = _PackedOut1x1(16, name="Conv_0")(d1)
        return jnp.tanh(unpack(out, 1))


class _PackedConv4x4s2(nn.Module):
    """nn.Conv(co, (4,4), strides 2, pad 1) twin on packed activations.

    ``packed=False`` runs the same params through the plain XLA conv on
    NHWC input (small-map fallback; see PackedDiscriminator)."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32
    packed: bool = True

    @nn.compact
    def __call__(self, xp):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4, 4, self.in_features, self.features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if not self.packed:
            y = jax.lax.conv_general_dilated(
                xp.astype(self.dtype), kernel.astype(self.dtype), (2, 2),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(y.dtype)
        y = conv4x4s2_packed_auto(xp.astype(self.dtype), kernel)
        return y + jnp.tile(bias, B).astype(y.dtype)[None, None, None, :]


class PackedDiscriminator(nn.Module):
    """models.unet.Discriminator twin (logits out), packed strided convs.

    Same parameter tree; the final 4x4 VALID conv runs unpacked (tiny map).
    The round-2 wiring measured SLOWER than the standard Discriminator
    (47.9 vs 38.6 s at 1500 epochs, scatter-based band build); after the
    boundary-column band form of conv4x4s2_packed this is the FASTER path
    in context (12.7 vs 19.2 ms/epoch with everything else packed,
    tools/gan_epoch_time.py round 3) and methods.neural defaults to it
    (GANTrainConfig.packed_d=True).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        # packing survives three stride-2 levels only when W % 64 == 0
        # (wb must stay even); smaller maps take the plain-conv path with
        # the SAME parameters
        fast = x.shape[2] % 64 == 0
        if fast:
            h = pack(x.astype(dt))
        else:
            h = x.astype(dt)
        h = _PackedConv4x4s2(16, 1, dt, fast, name="Conv_0")(h)
        h = nn.leaky_relu(h, 0.2)
        h = _PackedConv4x4s2(32, 16, dt, fast, name="Conv_1")(h)
        if fast:
            h = PackedBatchNorm(32, name="BatchNorm_0")(h, train)
        else:
            h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             dtype=jnp.float32,
                             name="BatchNorm_0")(h.astype(jnp.float32))
        h = nn.leaky_relu(h, 0.2)
        h = _PackedConv4x4s2(64, 32, dt, fast, name="Conv_2")(h)
        if fast:
            h = PackedBatchNorm(64, name="BatchNorm_1")(h, train)
        else:
            h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             dtype=jnp.float32,
                             name="BatchNorm_1")(h.astype(jnp.float32))
        h = nn.leaky_relu(h, 0.2)
        if fast:
            h = unpack(h, 64)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding="VALID",
                       name="Conv_3")(h.astype(jnp.float32))

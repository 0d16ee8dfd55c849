"""Spectrogram U-Net / GAN models (flax.linen, NHWC).

Architecture parity with the reference (SURVEY.md §2):

- SimpleUNet (main5_UNet_mask.py:11-56): 2-level U-Net, conv_block =
  2x(Conv3x3 + ReLU), channels 1->16->32->64 bottleneck, ConvTranspose(k2,s2)
  ups + skip concat, 1x1 final conv.
- GeneratorUNet (main_gan_gap.py:14-52): same topology with BatchNorm +
  LeakyReLU(0.2) blocks and tanh output.
- Discriminator (main_gan_gap.py:54-71): 4 strided 4x4 convs (16/32/64
  channels, BatchNorm after the 2nd and 3rd), sigmoid PatchGAN-style output.

TPU-native divergence (documented): inputs are padded to multiples of 4
before the net and cropped after, so ConvTranspose doublings align with the
encoder skips exactly — replacing the reference's per-layer
``F.interpolate`` shape fix-ups (main5_UNet_mask.py:47, 52) with static,
XLA-friendly shapes. Same function class, better fusion.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fastconv import conv3x3_fast

# BatchNorm running-average momentum shared by every BN in the model zoo
# (SimpleUNet, GeneratorUNet, Discriminator and their packed twins). The
# vmap_d running-stats merge in methods/neural.py derives its closed form
# from this value — change it HERE, nowhere else.
BN_MOMENTUM = 0.9


class Conv3x3(nn.Module):
    """3x3 SAME conv backed by ops.fastconv's MXU-friendly custom VJP.

    Parameter layout matches nn.Conv ('kernel' HWIO + 'bias'), so checkpoints
    are interchangeable with the stock module.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        # kernel stays f32: conv3x3_fast computes fwd in x's dtype but
        # returns the weight grad in f32 (no bf16 rounding of updates)
        y = conv3x3_fast(x.astype(self.dtype), kernel)
        return y + bias.astype(self.dtype)


class ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32  # compute dtype; params stay f32

    @nn.compact
    def __call__(self, x):
        x = Conv3x3(self.features, self.dtype)(x)
        x = nn.relu(x)
        x = Conv3x3(self.features, self.dtype)(x)
        return nn.relu(x)


class BNLeakyConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # BatchNorm always reduces in f32: bf16 batch statistics destabilize
        # the adversarial loop (observed NaN around epoch ~1000)
        x = Conv3x3(self.features, self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        x = nn.leaky_relu(x, 0.2)
        x = Conv3x3(self.features, self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        return nn.leaky_relu(x, 0.2)


def _pool(x):
    # nn.max_pool's select_and_scatter backward (6.6 ms/GAN-epoch in the
    # device trace) was A/B'd against a reshape+max formulation; the
    # reshape's extra relayout copies cost MORE (486 vs 451 ms device time
    # per 10 epochs). Keep reduce_window.
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up(features, dtype=jnp.float32):
    return nn.ConvTranspose(features, (2, 2), strides=(2, 2), dtype=dtype)


class SimpleUNet(nn.Module):
    """(N, F, T, 1) -> (N, F, T, 1); F, T must be multiples of 4.

    ``dtype=jnp.bfloat16`` runs convs on the MXU's bf16 path (params and
    the final output stay f32)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        e1 = ConvBlock(16, dt)(x)
        e2 = ConvBlock(32, dt)(_pool(e1))
        b = ConvBlock(64, dt)(_pool(e2))
        d2 = ConvBlock(32, dt)(jnp.concatenate([e2, _up(32, dt)(b)], axis=-1))
        d1 = ConvBlock(16, dt)(jnp.concatenate([e1, _up(16, dt)(d2)], axis=-1))
        return nn.Conv(1, (1, 1))(d1.astype(jnp.float32))


class GeneratorUNet(nn.Module):
    """GAN generator: SimpleUNet topology + BatchNorm/LeakyReLU + tanh."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        e1 = BNLeakyConvBlock(16, dt)(x, train)
        e2 = BNLeakyConvBlock(32, dt)(_pool(e1), train)
        b = BNLeakyConvBlock(64, dt)(_pool(e2), train)
        d2 = BNLeakyConvBlock(32, dt)(
            jnp.concatenate([e2, _up(32, dt)(b)], axis=-1), train)
        d1 = BNLeakyConvBlock(16, dt)(
            jnp.concatenate([e1, _up(16, dt)(d2)], axis=-1), train)
        return jnp.tanh(nn.Conv(1, (1, 1))(d1.astype(jnp.float32)))


class Discriminator(nn.Module):
    """Strided-conv PatchGAN-style discriminator.

    Returns LOGITS; apply sigmoid for probabilities. The reference's
    Sigmoid+BCELoss pairing (main_gan_gap.py:67, 120) survives saturation
    only because torch clamps log outputs at -100; computing BCE from logits
    is the numerically identical-but-stable formulation (observed NaN at
    ~epoch 700-1500 otherwise, seed dependent).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x = nn.Conv(16, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=dt)(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(32, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        x = nn.leaky_relu(x, 0.2).astype(dt)
        x = nn.Conv(64, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=dt)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         dtype=jnp.float32)(x.astype(jnp.float32))
        x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding="VALID")(
            x.astype(jnp.float32))


def pad_to_multiple(x: jax.Array, multiple: int = 4) -> tuple[jax.Array, tuple[int, int]]:
    """Pad (F, T) up to multiples of ``multiple`` (zeros); return pad amounts."""
    f, t = x.shape
    pf = (-f) % multiple
    pt = (-t) % multiple
    return jnp.pad(x, ((0, pf), (0, pt))), (pf, pt)

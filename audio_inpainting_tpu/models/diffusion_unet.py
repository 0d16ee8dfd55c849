"""Compact time-conditioned UNet for spectrogram-image diffusion.

A small epsilon-predictor for the diffusion inpainting method
(methods/diffusion.py). The reference delegates this role to the pretrained
riffusion Stable-Diffusion UNet (main_diffusion_gap.py:16-19); this image is
zero-egress, so the framework ships a self-trainable per-clip model (same
per-clip-overfit spirit as the reference's U-Net/GAN scripts) and a weight
loading hook for a local riffusion checkpoint.

NHWC, GroupNorm+SiLU blocks, sinusoidal time embedding, 3 resolutions.
Fully convolutional: train on small patches, sample at any multiple-of-4.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fastconv import conv3x3_fast


class _FastConv3x3(nn.Module):
    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        init = (nn.initializers.zeros if self.zero_init
                else nn.initializers.lecun_normal())
        k = self.param("kernel", init, (3, 3, x.shape[-1], self.features),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return conv3x3_fast(x, k) + b


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """Sinusoidal embedding; t float (B,) in [0, 1000)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) * jnp.arange(half) / half)
    ang = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class ResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(num_groups=8)(x)
        h = nn.silu(h)
        h = _FastConv3x3(self.features)(h)
        h = h + nn.Dense(self.features)(nn.silu(temb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=8)(h)
        h = nn.silu(h)
        h = _FastConv3x3(self.features)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1))(x)
        return x + h


class DiffusionUNet(nn.Module):
    base: int = 32
    temb_dim: int = 128

    @nn.compact
    def __call__(self, x, t):
        temb = timestep_embedding(t, self.temb_dim)
        temb = nn.Dense(self.temb_dim)(nn.silu(nn.Dense(self.temb_dim)(temb)))

        c1, c2, c3 = self.base, self.base * 2, self.base * 4
        h1 = ResBlock(c1)(_FastConv3x3(c1)(x), temb)
        d1 = nn.Conv(c2, (3, 3), strides=(2, 2), padding="SAME")(h1)
        h2 = ResBlock(c2)(d1, temb)
        d2 = nn.Conv(c3, (3, 3), strides=(2, 2), padding="SAME")(h2)
        b = ResBlock(c3)(ResBlock(c3)(d2, temb), temb)
        u2 = nn.ConvTranspose(c2, (2, 2), strides=(2, 2))(b)
        h2u = ResBlock(c2)(jnp.concatenate([u2, h2], axis=-1), temb)
        u1 = nn.ConvTranspose(c1, (2, 2), strides=(2, 2))(h2u)
        h1u = ResBlock(c1)(jnp.concatenate([u1, h1], axis=-1), temb)
        out = nn.GroupNorm(num_groups=8)(h1u)
        return _FastConv3x3(x.shape[-1], zero_init=True)(nn.silu(out))

"""Flax AutoencoderKL — the Stable Diffusion v1 VAE, TPU-native.

Reimplemented from the SD v1 architecture (what ``riffusion-model-v1``
ships; reference pipeline main_diffusion_gap.py:16-19). Module names mirror
the diffusers checkpoint key layout so models/sd/loader.py can map
safetensors weights mechanically (see loader.flax_to_torch_key).

``tiny()`` gives a scaled-down config for shape-level unit tests — real
weights are not downloadable in this zero-egress environment.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215  # SD v1 latent scale

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                         norm_groups=4)


class VAEResnet(nn.Module):
    """ResnetBlock2D without time embedding (VAE flavor)."""

    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block).

    Parameter layout matches modern diffusers keys (group_norm,
    to_q/to_k/to_v/to_out.0); the loader aliases the legacy
    query/key/value/proj_attn names onto these.
    """

    groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, name="to_q")(x)
        k = nn.Dense(c, name="to_k")(x)
        v = nn.Dense(c, name="to_v")(x)
        attn = jnp.einsum("bqc,bkc->bqk", q, k) / jnp.sqrt(c)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v)
        out = nn.Dense(c, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + res


class VAEDownsample(nn.Module):
    """Stride-2 conv with the VAE's asymmetric (0,1) pad (diffusers parity)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       name="conv")(x)


class VAEUpsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, cfg.norm_groups,
                              name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = VAEDownsample(
                    ch, name=f"down_blocks_{i}_downsamplers_0")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnet(ch, cfg.norm_groups, name="mid_block_resnets_0")(h)
        h = VAEAttention(cfg.norm_groups, name="mid_block_attentions_0")(h)
        h = VAEResnet(ch, cfg.norm_groups, name="mid_block_resnets_1")(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3),
                       padding=((1, 1), (1, 1)), name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        rev = list(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)),
                    name="conv_in")(z)
        h = VAEResnet(rev[0], cfg.norm_groups, name="mid_block_resnets_0")(h)
        h = VAEAttention(cfg.norm_groups, name="mid_block_attentions_0")(h)
        h = VAEResnet(rev[0], cfg.norm_groups, name="mid_block_resnets_1")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, cfg.norm_groups,
                              name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                h = VAEUpsample(ch, name=f"up_blocks_{i}_upsamplers_0")(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """NHWC. encode -> (mean, logvar) latent moments; decode latents."""

    cfg: VAEConfig = field(default_factory=VAEConfig)

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        mean, logvar = self.encode(x)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return self.decode(z), mean, logvar


def sample_latent(mean, logvar, key):
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)

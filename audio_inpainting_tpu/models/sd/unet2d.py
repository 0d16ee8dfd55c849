"""Flax UNet2DCondition — the Stable Diffusion v1 denoiser, TPU-native.

Reimplemented from the SD v1 architecture description (what
``riffusion/riffusion-model-v1`` ships; reference pipeline
main_diffusion_gap.py:16-19) so the checkpoint's torch weights can be
loaded via models/sd/loader.py. Parameter names/shapes mirror the
checkpoint layout 1:1 (module path == torch key path) to make the
safetensors mapping mechanical.

Config defaults are SD v1.x; ``tiny()`` returns a scaled-down config used
by the shape-level unit tests (weights are not downloadable in this
environment — VERDICT round 1, task 5).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8          # heads per attention layer
    norm_groups: int = 32
    # block types, outermost first (SD v1: cross-attn in all but the last)
    down_types: tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D")
    up_types: tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D")
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    @staticmethod
    def tiny() -> "UNetConfig":
        return UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                          cross_attention_dim=16, attention_head_dim=2,
                          norm_groups=4,
                          down_types=("CrossAttnDownBlock2D", "DownBlock2D"),
                          up_types=("UpBlock2D", "CrossAttnUpBlock2D"))


def timestep_embedding(t: jax.Array, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 1e4):
    """Sinusoidal timestep embedding, diffusers convention."""
    half = dim // 2
    exponent = -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = t[:, None].astype(jnp.float32) * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, name="linear_1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, name="linear_2")(emb)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, temb):
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention, diffusers parameter layout (to_q/k/v/out.0)."""

    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)

        def split(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.heads, self.dim_head).transpose(
                0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(self.dim_head)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        b, h, l, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, l, h * d)
        return nn.Dense(x.shape[-1], name="to_out_0")(out)


class GEGLU(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class FeedForward(nn.Module):
    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * 4, name="net_0")(x)
        return nn.Dense(dim, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.heads, self.dim_head, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x))
        x = x + Attention(self.heads, self.dim_head, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), context)
        x = x + FeedForward(name="ff")(
            nn.LayerNorm(epsilon=1e-5, name="norm3")(x))
        return x


class Transformer2D(nn.Module):
    heads: int
    dim_head: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(self.groups, epsilon=1e-6, name="norm")(x)
        x = nn.Conv(c, (1, 1), name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        x = BasicTransformerBlock(self.heads, self.dim_head,
                                  name="transformer_blocks_0")(x, context)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), name="proj_out")(x)
        return x + res


class Downsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)), name="conv")(x)


class Upsample2D(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv")(x)


class UNet2DCondition(nn.Module):
    """Input (N, H, W, in_channels) NHWC, timesteps (N,), context
    (N, L, cross_attention_dim) -> (N, H, W, out_channels)."""

    cfg: UNetConfig = field(default_factory=UNetConfig)

    @nn.compact
    def __call__(self, x, timesteps, context):
        cfg = self.cfg
        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(timesteps, ch0, cfg.flip_sin_to_cos,
                                  cfg.freq_shift)
        temb = TimestepEmbedding(ch0 * 4, name="time_embedding")(temb)

        h = nn.Conv(ch0, (3, 3), padding=((1, 1), (1, 1)), name="conv_in")(x)
        skips = [h]

        def heads_dim(ch):
            n_heads = cfg.attention_head_dim
            return n_heads, ch // n_heads

        # --- down ---
        for i, (btype, ch) in enumerate(zip(cfg.down_types,
                                            cfg.block_out_channels)):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, cfg.norm_groups,
                                  name=f"down_blocks_{i}_resnets_{j}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    nh, dh = heads_dim(ch)
                    h = Transformer2D(nh, dh, cfg.norm_groups,
                                      name=f"down_blocks_{i}_attentions_{j}")(
                                          h, context)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, name=f"down_blocks_{i}_downsamplers_0")(h)
                skips.append(h)

        # --- mid ---
        ch = cfg.block_out_channels[-1]
        nh, dh = heads_dim(ch)
        h = ResnetBlock2D(ch, cfg.norm_groups,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2D(nh, dh, cfg.norm_groups,
                          name="mid_block_attentions_0")(h, context)
        h = ResnetBlock2D(ch, cfg.norm_groups,
                          name="mid_block_resnets_1")(h, temb)

        # --- up ---
        rev_ch = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_types):
            ch = rev_ch[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(ch, cfg.norm_groups,
                                  name=f"up_blocks_{i}_resnets_{j}")(h, temb)
                if btype == "CrossAttnUpBlock2D":
                    nh, dh = heads_dim(ch)
                    h = Transformer2D(nh, dh, cfg.norm_groups,
                                      name=f"up_blocks_{i}_attentions_{j}")(
                                          h, context)
            if i < len(cfg.up_types) - 1:
                h = Upsample2D(ch, name=f"up_blocks_{i}_upsamplers_0")(h)

        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="conv_out")(h)

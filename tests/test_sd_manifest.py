"""Full-default SD-v1 checkpoint-layout validation, offline (VERDICT r4 #4).

Real riffusion weights cannot be fetched here (zero egress), so the day a
real checkpoint lands in ``checkpoint_root`` must be a no-code-change load.
These tests close the offline gap three ways:

1. the FULL-default UNet2DCondition + AutoencoderKL param manifest
   (eval_shape — no weights materialized) maps through the loader to
   exactly the frozen manifest in tests/golden/sd_v1_manifest.json
   (tools/gen_sd_manifest.py), so model/loader drift surfaces now, not on
   weight-arrival day;
2. hand-written anchor facts from the public SD-v1 serialization — key
   names AND torch shapes for every structural family (time embedding,
   down/mid/up resnets with/without shortcuts, self/cross attention,
   GEGLU, up-block skip-concat widths, VAE encoder/decoder/mid/quant) —
   are asserted against that manifest: the offline evidence the frozen
   file IS the real layout (the tensor counts 686/248 and totals
   859.5M/83.7M match the public SD-v1 model card numbers too);
3. the synthetic-checkpoint round trip covers the FULL diffusers directory
   layout including text_encoder + tokenizer with load_text=True, and
   riffusion_restore_audio runs end-to-end audio->audio at tiny configs.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_inpainting_tpu.models.sd.loader import flax_to_torch_key
from audio_inpainting_tpu.models.sd.unet2d import UNet2DCondition, UNetConfig
from audio_inpainting_tpu.models.sd.vae import AutoencoderKL, VAEConfig

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "sd_v1_manifest.json")


def _torch_shape(path, shape):
    if path[-1] == "kernel":
        if len(shape) == 4:
            return [shape[3], shape[2], shape[0], shape[1]]
        if len(shape) == 2:
            return [shape[1], shape[0]]
    return list(shape)


def _manifest(model, *init_args):
    from flax.traverse_util import flatten_dict

    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args)
    return {flax_to_torch_key(p): _torch_shape(p, tuple(l.shape))
            for p, l in flatten_dict(variables["params"]).items()}


@pytest.fixture(scope="module")
def frozen():
    with open(GOLDEN) as f:
        return json.load(f)


def test_full_default_unet_manifest_matches_frozen(frozen):
    ucfg = UNetConfig()
    got = _manifest(UNet2DCondition(ucfg),
                    jnp.zeros((1, 64, 64, ucfg.in_channels)),
                    jnp.zeros((1,)),
                    jnp.zeros((1, 77, ucfg.cross_attention_dim)))
    assert got == frozen["unet"]


def test_full_default_vae_manifest_matches_frozen(frozen):
    vcfg = VAEConfig()
    got = _manifest(AutoencoderKL(vcfg),
                    jnp.zeros((1, 64, 64, vcfg.in_channels)),
                    jax.random.PRNGKey(1))
    assert got == frozen["vae"]


def test_manifest_counts_match_sd_v1(frozen):
    """SD v1 public numbers: UNet 686 tensors / 859.5 M params, VAE 248
    tensors / 83.65 M params."""
    assert len(frozen["unet"]) == 686
    assert len(frozen["vae"]) == 248
    n_u = sum(int(np.prod(s)) for s in frozen["unet"].values())
    n_v = sum(int(np.prod(s)) for s in frozen["vae"].values())
    assert abs(n_u - 859_520_964) < 1_000_000, n_u
    assert abs(n_v - 83_653_863) < 500_000, n_v


# Anchor facts from the public SD-v1 diffusers serialization as the
# riffusion-v1-era checkpoint ships it: transformer proj_in/proj_out as
# 1x1 convs (diffusers <= 0.14), attention q/k/v as Linear. The VAE's
# even-older query/key/value/proj_attn aliases are absorbed at load time
# (loader.py), pinned in test_sd.py. One entry per structural family,
# including every channel transition.
UNET_ANCHORS = {
    "conv_in.weight": [320, 4, 3, 3],
    "conv_in.bias": [320],
    "time_embedding.linear_1.weight": [1280, 320],
    "time_embedding.linear_2.weight": [1280, 1280],
    # down path: 320 -> 320 -> 640 -> 1280 -> 1280
    "down_blocks.0.resnets.0.norm1.weight": [320],
    "down_blocks.0.resnets.0.conv1.weight": [320, 320, 3, 3],
    "down_blocks.0.resnets.0.time_emb_proj.weight": [320, 1280],
    "down_blocks.1.resnets.0.conv1.weight": [640, 320, 3, 3],
    "down_blocks.1.resnets.0.conv_shortcut.weight": [640, 320, 1, 1],
    "down_blocks.2.resnets.0.conv_shortcut.weight": [1280, 640, 1, 1],
    "down_blocks.0.downsamplers.0.conv.weight": [320, 320, 3, 3],
    "down_blocks.2.downsamplers.0.conv.weight": [1280, 1280, 3, 3],
    # self-attention (to_k == ch) vs cross-attention (to_k == 768)
    "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
        [320, 320],
    "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight":
        [320, 768],
    "down_blocks.2.attentions.1.transformer_blocks.0.attn2.to_v.weight":
        [1280, 768],
    "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_out.0.weight":
        [320, 320],
    # GEGLU feed-forward: net.0.proj doubles the 4x expansion
    "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight":
        [2560, 320],
    "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight":
        [320, 1280],
    # proj_in/proj_out are 1x1 CONVS — the riffusion-v1-era (diffusers
    # <= 0.14) serialization, which is what the actual target checkpoint
    # ships; the flax Transformer2D mirrors it directly (unet2d.py)
    "down_blocks.0.attentions.0.proj_in.weight": [320, 320, 1, 1],
    "down_blocks.0.attentions.0.proj_out.weight": [320, 320, 1, 1],
    "mid_block.attentions.0.proj_in.weight": [1280, 1280, 1, 1],
    "down_blocks.0.attentions.0.norm.weight": [320],
    # mid
    "mid_block.resnets.0.conv1.weight": [1280, 1280, 3, 3],
    "mid_block.attentions.0.transformer_blocks.0.attn1.to_q.weight":
        [1280, 1280],
    # up path skip-concat widths: up_blocks.0 resnet 0 takes
    # prev(1280) + skip(1280); up_blocks.3 resnet 2 takes 320 + 320
    "up_blocks.0.resnets.0.norm1.weight": [2560],
    "up_blocks.0.resnets.0.conv1.weight": [1280, 2560, 3, 3],
    "up_blocks.0.resnets.0.conv_shortcut.weight": [1280, 2560, 1, 1],
    "up_blocks.1.resnets.2.conv1.weight": [1280, 1920, 3, 3],
    "up_blocks.2.resnets.0.conv1.weight": [640, 1920, 3, 3],
    "up_blocks.2.resnets.2.conv1.weight": [640, 960, 3, 3],
    "up_blocks.3.resnets.0.conv1.weight": [320, 960, 3, 3],
    "up_blocks.3.resnets.2.conv1.weight": [320, 640, 3, 3],
    "up_blocks.0.upsamplers.0.conv.weight": [1280, 1280, 3, 3],
    "up_blocks.2.upsamplers.0.conv.weight": [640, 640, 3, 3],
    # head
    "conv_norm_out.weight": [320],
    "conv_out.weight": [4, 320, 3, 3],
    "conv_out.bias": [4],
}

VAE_ANCHORS = {
    "encoder.conv_in.weight": [128, 3, 3, 3],
    "encoder.down_blocks.0.resnets.0.conv1.weight": [128, 128, 3, 3],
    "encoder.down_blocks.1.resnets.0.conv_shortcut.weight": [256, 128, 1, 1],
    "encoder.down_blocks.0.downsamplers.0.conv.weight": [128, 128, 3, 3],
    "encoder.mid_block.resnets.0.conv1.weight": [512, 512, 3, 3],
    "encoder.mid_block.attentions.0.to_q.weight": [512, 512],
    "encoder.mid_block.attentions.0.to_out.0.weight": [512, 512],
    "encoder.conv_out.weight": [8, 512, 3, 3],   # 2*latent_channels moments
    "decoder.conv_in.weight": [512, 4, 3, 3],
    "decoder.up_blocks.0.resnets.0.conv1.weight": [512, 512, 3, 3],
    "decoder.up_blocks.2.resnets.0.conv_shortcut.weight": [256, 512, 1, 1],
    "decoder.up_blocks.0.upsamplers.0.conv.weight": [512, 512, 3, 3],
    "decoder.conv_out.weight": [3, 128, 3, 3],
    "quant_conv.weight": [8, 8, 1, 1],
    "post_quant_conv.weight": [4, 4, 1, 1],
}


def test_unet_anchor_facts_present(frozen):
    for key, shape in UNET_ANCHORS.items():
        assert frozen["unet"].get(key) == shape, (
            key, frozen["unet"].get(key), shape)


def test_vae_anchor_facts_present(frozen):
    for key, shape in VAE_ANCHORS.items():
        assert frozen["vae"].get(key) == shape, (
            key, frozen["vae"].get(key), shape)


def test_manifest_no_orphan_families(frozen):
    """Every manifest key belongs to a known structural family — a typo'd
    module name in the flax model would mint a novel top-level prefix that
    no real checkpoint key matches."""
    unet_prefixes = ("conv_in.", "conv_out.", "conv_norm_out.",
                     "time_embedding.", "down_blocks.", "mid_block.",
                     "up_blocks.")
    vae_prefixes = ("encoder.", "decoder.", "quant_conv.",
                    "post_quant_conv.")
    for k in frozen["unet"]:
        assert k.startswith(unet_prefixes), k
    for k in frozen["vae"]:
        assert k.startswith(vae_prefixes), k

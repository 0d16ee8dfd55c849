"""Checkpoint loader: diffusers-layout torch weights -> Flax param trees.

The reference downloads ``riffusion/riffusion-model-v1`` from the hub
(main_diffusion_gap.py:16-19). This environment has zero egress, so the
loader takes a LOCAL directory in the diffusers layout::

    <root>/unet/diffusion_pytorch_model.safetensors
    <root>/vae/diffusion_pytorch_model.safetensors
    <root>/text_encoder/(model.safetensors|pytorch_model.bin)
    <root>/tokenizer/{vocab.json,merges.txt,...}

Because models/sd/unet2d.py and vae.py name every Flax module after the
torch key path (digits fused with underscores), the key mapping is a pure
string transform — no per-layer tables. Validated by round-trip unit tests
that synthesize a torch-style state dict from a randomly initialized Flax
model (tests/test_sd.py); real weights slot in unchanged.
"""

from __future__ import annotations

import os
import re

import numpy as np

# flax module names that must keep their literal underscore (diffusers uses
# these names verbatim in torch keys)
_PROTECTED = ("linear_1", "linear_2", "group_norm", "time_emb_proj",
              "proj_in", "proj_out", "conv_in", "conv_out", "conv_norm_out",
              "conv_shortcut", "time_embedding", "transformer_blocks",
              "down_blocks", "up_blocks", "mid_block", "quant_conv",
              "post_quant_conv", "to_q", "to_k", "to_v", "to_out", "net_",
              "attn1", "attn2", "norm1", "norm2", "norm3")

# containers that follow a non-digit segment (regex below can't see these)
_LITERAL = {
    "mid_block_resnets": "mid_block.resnets",
    "mid_block_attentions": "mid_block.attentions",
    "net_0": "net.0",
    "net_2": "net.2",
    "to_out_0": "to_out.0",
}

# legacy diffusers VAE attention key aliases (pre-0.15 checkpoints)
_VAE_ATTN_ALIASES = {
    "to_q": "query", "to_k": "key", "to_v": "value", "to_out.0": "proj_attn",
}


def flax_to_torch_key(path: tuple[str, ...]) -> str:
    """('down_blocks_0_resnets_0','conv1','kernel') ->
    'down_blocks.0.resnets.0.conv1.weight'."""
    *mods, leaf = path
    segs = []
    for m in mods:
        for lit, rep in _LITERAL.items():
            if m == lit:
                m = rep
                break
        else:
            if m not in _PROTECTED:
                m = re.sub(r"_(?=\d)", ".", m)
                m = re.sub(r"(?<=\d)_", ".", m)
            for lit, rep in _LITERAL.items():
                if lit in m:
                    m = m.replace(lit, rep)
        segs.append(m)
    suffix = {"kernel": "weight", "scale": "weight", "bias": "bias",
              "embedding": "weight"}[leaf]
    return ".".join(segs + [suffix])


def _to_flax_tensor(torch_arr: np.ndarray, leaf: str,
                    flax_shape: tuple[int, ...]) -> np.ndarray:
    a = np.asarray(torch_arr)
    if leaf == "kernel":
        if a.ndim == 4:                       # conv (O,I,kh,kw)->(kh,kw,I,O)
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 2:                     # linear (O,I)->(I,O)
            a = a.transpose(1, 0)
    if a.shape != tuple(flax_shape):
        # legacy 1x1-conv attention weights squeezing into Dense
        if a.ndim == 4 and a.shape[:2] == (1, 1):
            a = a[0, 0]
        if a.shape != tuple(flax_shape):
            raise ValueError(
                f"shape mismatch: torch {a.shape} vs flax {flax_shape}")
    return a


def torch_to_flax(state_dict: dict, flax_params, strict: bool = True):
    """Map a torch state dict onto the structure of ``flax_params``.

    flax_params: a params pytree from model.init (values only provide
    shapes/dtypes). Returns a new pytree of the checkpoint's weights.
    """
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(flax_params)
    out = {}
    used = set()
    missing = []
    for path, val in flat.items():
        shape = tuple(getattr(val, "shape", ()) or np.shape(val))
        dtype = getattr(val, "dtype", np.float32)
        key = flax_to_torch_key(path)
        src = state_dict.get(key)
        if src is None:
            for new, old in _VAE_ATTN_ALIASES.items():
                if new in key:
                    src = state_dict.get(key.replace(new, old))
                    if src is not None:
                        key = key.replace(new, old)
                        break
        if src is None:
            missing.append(key)
            continue
        used.add(key)
        out[path] = jnp.asarray(_to_flax_tensor(src, path[-1], shape), dtype)
    if missing and strict:
        raise KeyError(f"{len(missing)} params missing from checkpoint, "
                       f"e.g. {missing[:5]}")
    unused = [k for k in state_dict if k not in used
              and not k.endswith("num_batches_tracked")]
    if unused and strict:
        raise KeyError(f"{len(unused)} checkpoint keys unused, "
                       f"e.g. {sorted(unused)[:5]}")
    return unflatten_dict(out)


def flax_to_torch_state(flax_params) -> dict:
    """Inverse of torch_to_flax (testing aid + export path)."""
    from flax.traverse_util import flatten_dict

    out = {}
    for path, val in flatten_dict(flax_params).items():
        a = np.asarray(val)
        if path[-1] == "kernel":
            if a.ndim == 4:
                a = a.transpose(3, 2, 0, 1)
            elif a.ndim == 2:
                a = a.transpose(1, 0)
        out[flax_to_torch_key(path)] = a
    return out


def load_torch_weights(model_dir: str) -> dict:
    """Read every *.safetensors / *.bin in a directory into one numpy dict."""
    state = {}
    for name in sorted(os.listdir(model_dir)):
        p = os.path.join(model_dir, name)
        if name.endswith(".safetensors"):
            from safetensors.numpy import load_file

            state.update(load_file(p))
        elif name.endswith(".bin"):
            import torch

            sd = torch.load(p, map_location="cpu", weights_only=True)
            state.update({k: v.numpy() for k, v in sd.items()})
    if not state:
        raise FileNotFoundError(f"no .safetensors/.bin under {model_dir}")
    return state


def load_riffusion(root: str, unet_cfg=None, vae_cfg=None,
                   load_text: bool = True):
    """Load a local diffusers-layout SD/riffusion checkpoint.

    Returns dict with 'unet_params', 'vae_params', 'text_encoder' (a
    FlaxCLIPTextModel), 'tokenizer'. Raises FileNotFoundError if the
    directory is absent (zero-egress envs never have it; the diffusion
    method then falls back to the native DDPM engine). ``load_text=False``
    skips the CLIP/tokenizer legs (unit tests; caller supplies embeddings).
    """
    import jax.numpy as jnp

    from .unet2d import UNet2DCondition, UNetConfig
    from .vae import AutoencoderKL, VAEConfig

    unet_cfg = unet_cfg or UNetConfig()
    vae_cfg = vae_cfg or VAEConfig()

    import jax

    unet = UNet2DCondition(unet_cfg)
    n_down = 2 ** (len(unet_cfg.block_out_channels) - 1)
    uvars = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 8 * n_down, 8 * n_down, unet_cfg.in_channels)),
        jnp.zeros((1,)), jnp.zeros((1, 2, unet_cfg.cross_attention_dim)))
    unet_params = torch_to_flax(load_torch_weights(os.path.join(root, "unet")),
                                uvars["params"])

    vae = AutoencoderKL(vae_cfg)
    vvars = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, vae_cfg.in_channels)), jax.random.PRNGKey(1))
    vae_params = torch_to_flax(load_torch_weights(os.path.join(root, "vae")),
                               vvars["params"])

    text_encoder = tokenizer = None
    if load_text:
        from transformers import CLIPTokenizer, FlaxCLIPTextModel

        text_encoder = FlaxCLIPTextModel.from_pretrained(
            os.path.join(root, "text_encoder"), from_pt=True)
        tokenizer = CLIPTokenizer.from_pretrained(
            os.path.join(root, "tokenizer"))
    return {"unet_params": unet_params, "vae_params": vae_params,
            "text_encoder": text_encoder, "tokenizer": tokenizer,
            "unet_cfg": unet_cfg, "vae_cfg": vae_cfg}

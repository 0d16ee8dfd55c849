#!/usr/bin/env python
"""Freeze the FULL-DEFAULT SD-v1 checkpoint key manifest (VERDICT r4 #4a).

Real ``riffusion/riffusion-model-v1`` weights are unobtainable in this
zero-egress environment, so the day they appear must be a no-code-change
load. This tool `jax.eval_shape`s the full-default UNet2DCondition +
AutoencoderKL (models/sd/unet2d.py:25-41, vae.py:22-29 defaults — SD v1.x),
maps every parameter through the loader's `flax_to_torch_key`, and writes
the (key -> torch-layout shape) manifest to
tests/golden/sd_v1_manifest.json. tests/test_sd_manifest.py then pins:

  1. the live model+loader still produce exactly this manifest (drift in
     either would otherwise surface only on weight-arrival day), and
  2. a curated set of hand-written anchor facts from the public SD-v1
     layout (key names AND shapes for every structural family) is present
     in it — the offline evidence that the frozen manifest IS the real
     layout.

Layout convention: the manifest matches the serialization the actual
riffusion-v1 checkpoint ships (diffusers <= 0.14 era): transformer
proj_in/proj_out as 1x1 convs, attention to_q/to_k/to_v as Linear. The
VAE's even-older query/key/value/proj_attn attention aliases are absorbed
at load time by the loader's alias + squeeze paths (loader.py:45-47,
82-84), pinned separately by
tests/test_sd.py::test_loader_legacy_vae_attention_aliases.

No weights are materialized — eval_shape only — so this runs in seconds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from audio_inpainting_tpu.models.sd.loader import flax_to_torch_key  # noqa: E402
from audio_inpainting_tpu.models.sd.unet2d import (UNet2DCondition,  # noqa: E402
                                                   UNetConfig)
from audio_inpainting_tpu.models.sd.vae import AutoencoderKL, VAEConfig  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                   "sd_v1_manifest.json")


def torch_shape(path: tuple[str, ...], shape: tuple[int, ...]) -> list[int]:
    """flax param shape -> torch state-dict shape (loader transposes)."""
    if path[-1] == "kernel":
        if len(shape) == 4:                     # (kh,kw,I,O) -> (O,I,kh,kw)
            return [shape[3], shape[2], shape[0], shape[1]]
        if len(shape) == 2:                     # (I,O) -> (O,I)
            return [shape[1], shape[0]]
    return list(shape)


def manifest_of(model, *init_args) -> dict[str, list[int]]:
    from flax.traverse_util import flatten_dict

    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), *init_args)
    out = {}
    for path, leaf in flatten_dict(variables["params"]).items():
        out[flax_to_torch_key(path)] = torch_shape(path, tuple(leaf.shape))
    return out


def main() -> int:
    ucfg, vcfg = UNetConfig(), VAEConfig()
    unet = UNet2DCondition(ucfg)
    # spatial dims are irrelevant to the param tree; 64x64 is the SD-v1
    # latent canvas (512 / 2^3)
    unet_m = manifest_of(
        unet, jnp.zeros((1, 64, 64, ucfg.in_channels)), jnp.zeros((1,)),
        jnp.zeros((1, 77, ucfg.cross_attention_dim)))
    vae = AutoencoderKL(vcfg)
    vae_m = manifest_of(vae, jnp.zeros((1, 64, 64, vcfg.in_channels)),
                        jax.random.PRNGKey(1))
    data = {"unet": dict(sorted(unet_m.items())),
            "vae": dict(sorted(vae_m.items()))}
    with open(OUT, "w") as f:
        json.dump(data, f, indent=0, sort_keys=True)
        f.write("\n")
    n_params_u = sum(
        int(jnp.prod(jnp.asarray(s))) for s in unet_m.values())
    n_params_v = sum(
        int(jnp.prod(jnp.asarray(s))) for s in vae_m.values())
    print(f"unet: {len(unet_m)} tensors, {n_params_u/1e6:.1f} M params")
    print(f"vae:  {len(vae_m)} tensors, {n_params_v/1e6:.1f} M params")
    print(f"wrote {os.path.normpath(OUT)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

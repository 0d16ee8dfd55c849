"""Riffusion/SD inpainting pipeline — TPU-native, one compiled denoise loop.

Mirrors the reference's
``StableDiffusionInpaintPipeline('riffusion/riffusion-model-v1')`` call
(main_diffusion_gap.py:58-67: prompt "high quality audio, ambient sound,
seamless transition", 50 steps, strength 1.0). Riffusion is a plain SD v1
fine-tune with a 4-channel UNet, so diffusers dispatches the *masked-latent*
inpainting algorithm: pure-noise init (strength 1.0), classifier-free
guidance at scale 7.5, PLMS denoising, and after every step the region
outside the mask is replaced by the original image's latents noised to the
next step's level (clean at the final step).

Differences from diffusers are structural, not semantic: the whole
51-evaluation PLMS loop (timetable duplicates one entry, scheduler.py) runs
as a single lax.scan'd XLA program with both CFG branches batched into one
UNet forward, instead of 51 Python-dispatched steps of two forwards.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .scheduler import (PLMSState, SchedulerConfig, add_noise,
                        alphas_cumprod, plms_init, plms_step, plms_timesteps)
from .unet2d import UNet2DCondition, UNetConfig
from .vae import AutoencoderKL, VAEConfig

PROMPT = "high quality audio, ambient sound, seamless transition"


@dataclass(frozen=True)
class InpaintConfig:
    steps: int = 50                  # reference num_inference_steps=50
    guidance_scale: float = 7.5      # diffusers default (reference omits it)
    strength: float = 1.0            # reference strength=1.0
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    sched: SchedulerConfig = SchedulerConfig()


def encode_prompt(tokenizer, text_encoder, prompt: str) -> np.ndarray:
    """(2, 77, ctx_dim) — row 0 unconditional, row 1 the prompt."""
    toks = tokenizer([""] + [prompt], padding="max_length",
                     max_length=tokenizer.model_max_length, truncation=True,
                     return_tensors="np")
    return np.asarray(text_encoder(toks.input_ids).last_hidden_state)


@partial(jax.jit, static_argnames=("cfg",))
def _encode_image(vae_params, img, key, cfg: InpaintConfig):
    """[-1,1] NHWC image -> scaled latents (sampled posterior)."""
    vae = AutoencoderKL(cfg.vae)
    mean, logvar = vae.apply({"params": vae_params}, img,
                             method=AutoencoderKL.encode)
    z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
    return z * cfg.vae.scaling_factor


@partial(jax.jit, static_argnames=("cfg",))
def _decode_latents(vae_params, latents, cfg: InpaintConfig):
    vae = AutoencoderKL(cfg.vae)
    img = vae.apply({"params": vae_params},
                    latents / cfg.vae.scaling_factor,
                    method=AutoencoderKL.decode)
    return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)


@partial(jax.jit, static_argnames=("cfg",))
def _denoise_loop(unet_params, init_latents, hole_mask, context, key,
                  cfg: InpaintConfig):
    """The compiled PLMS inpaint loop.

    init_latents: (1, h, w, 4) clean image latents. hole_mask: (1, h, w, 1)
    1 = inpaint. context: (2, 77, dim) [uncond; cond].
    """
    acp = alphas_cumprod(cfg.sched)
    table = jnp.asarray(plms_timesteps(cfg.steps, cfg.sched))
    n_evals = int(table.shape[0])
    unet = UNet2DCondition(cfg.unet)

    k_noise, k_init = jax.random.split(key)
    noise = jax.random.normal(k_noise, init_latents.shape)
    # strength 1.0 -> start from the fully-noised image latents, which at
    # t=timesteps[0] is statistically pure noise (diffusers semantics)
    latents = add_noise(init_latents, noise, table[0], acp)

    def body(carry, i):
        latents, state = carry
        t = table[i]
        x = jnp.concatenate([latents, latents], axis=0)
        eps_both = unet.apply({"params": unet_params}, x,
                              jnp.full((2,), t, jnp.float32), context)
        eps_u, eps_c = eps_both[0:1], eps_both[1:2]
        eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
        state, latents = plms_step(state, latents, eps, t, cfg.steps, acp,
                                   cfg.sched)
        # masked-latent composite: outside the hole, snap to the original
        # latents noised to the NEXT evaluation's level (clean at the end)
        is_last = i == n_evals - 1
        t_next = table[jnp.minimum(i + 1, n_evals - 1)]
        proper = jnp.where(is_last, init_latents,
                           add_noise(init_latents, noise, t_next, acp))
        latents = (1.0 - hole_mask) * proper + hole_mask * latents
        return (latents, state), None

    state = plms_init(init_latents.shape)
    (latents, _), _ = jax.lax.scan(body, (latents, state),
                                   jnp.arange(n_evals))
    return latents


def riffusion_inpaint_image(bundle: dict, image_rgb_u8: np.ndarray,
                            mask_u8: np.ndarray, prompt: str = PROMPT,
                            cfg: InpaintConfig = InpaintConfig(),
                            key: jax.Array | int = 0) -> np.ndarray:
    """Inpaint a 512x512 RGB uint8 image where mask_u8 == 255.

    bundle: the dict from loader.load_riffusion. Returns uint8 RGB.
    """
    if cfg.strength != 1.0:
        raise NotImplementedError(
            "only strength=1.0 (the reference's value) is supported; "
            "partial-strength would start the PLMS table mid-way")
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    cfg = InpaintConfig(steps=cfg.steps, guidance_scale=cfg.guidance_scale,
                        strength=cfg.strength,
                        unet=bundle.get("unet_cfg", cfg.unet),
                        vae=bundle.get("vae_cfg", cfg.vae), sched=cfg.sched)
    img = jnp.asarray(image_rgb_u8, jnp.float32)[None] / 127.5 - 1.0
    k_enc, k_loop = jax.random.split(key)
    latents0 = _encode_image(bundle["vae_params"], img, k_enc, cfg)

    n_down = 2 ** (len(cfg.vae.block_out_channels) - 1)
    h, w = mask_u8.shape[0] // n_down, mask_u8.shape[1] // n_down
    hole = np.asarray(mask_u8, np.float32) / 255.0
    hole = hole.reshape(h, n_down, w, n_down).max(axis=(1, 3))  # any-damaged
    hole_mask = jnp.asarray(hole)[None, :, :, None]

    context = jnp.asarray(encode_prompt(bundle["tokenizer"],
                                        bundle["text_encoder"], prompt))
    latents = _denoise_loop(bundle["unet_params"], latents0, hole_mask,
                            context, k_loop, cfg)
    out = _decode_latents(bundle["vae_params"], latents, cfg)
    return np.asarray(jnp.rint(out[0] * 255.0)).astype(np.uint8)

"""Stable Diffusion / Riffusion port (reference main_diffusion_gap.py).

Flax UNet2DCondition + AutoencoderKL + PLMS scheduler + masked-latent
inpaint pipeline, with a safetensors loader for local diffusers-layout
checkpoints (zero-egress: weights cannot be downloaded here; everything is
shape-validated by tests/test_sd.py on tiny configs).
"""

from .loader import (flax_to_torch_key, flax_to_torch_state, load_riffusion,
                     load_torch_weights, torch_to_flax)
from .pipeline import (PROMPT, InpaintConfig, encode_prompt,
                       riffusion_inpaint_image)
from .scheduler import (SchedulerConfig, add_noise, alphas_cumprod,
                        ddim_step, ddim_timesteps, plms_init, plms_step,
                        plms_timesteps)
from .unet2d import UNet2DCondition, UNetConfig
from .vae import AutoencoderKL, VAEConfig

__all__ = [
    "AutoencoderKL", "InpaintConfig", "PROMPT", "SchedulerConfig",
    "UNet2DCondition", "UNetConfig", "VAEConfig", "add_noise",
    "alphas_cumprod", "ddim_step", "ddim_timesteps", "encode_prompt",
    "flax_to_torch_key", "flax_to_torch_state", "load_riffusion",
    "load_torch_weights", "plms_init", "plms_step", "plms_timesteps",
    "riffusion_inpaint_image", "torch_to_flax",
]

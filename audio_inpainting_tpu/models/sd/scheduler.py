"""Functional PNDM (PLMS) + DDIM schedulers — SD v1 configuration.

The reference's `StableDiffusionInpaintPipeline('riffusion/riffusion-model-v1')`
(main_diffusion_gap.py:16-19) runs the checkpoint's PNDM scheduler with the
SD v1 config: 1000 train steps, scaled-linear betas in [0.00085, 0.012],
steps_offset=1, skip_prk_steps=True (pure PLMS multistep). This module
re-derives that algorithm in functional, lax.scan-friendly form: scheduler
state is an explicit pytree (ring buffer of the last 4 eps predictions), so
the whole 50-step denoise loop compiles into a single XLA program instead of
50 Python-dispatched steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    steps_offset: int = 1
    # SD v1: set_alpha_to_one=False -> final alpha_cumprod is acp[0]
    set_alpha_to_one: bool = False


def alphas_cumprod(cfg: SchedulerConfig = SchedulerConfig()) -> jnp.ndarray:
    """Scaled-linear beta schedule -> cumulative alpha products (f32)."""
    betas = np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                        cfg.num_train_timesteps, dtype=np.float64) ** 2
    return jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)


def plms_timesteps(num_inference_steps: int,
                   cfg: SchedulerConfig = SchedulerConfig()) -> np.ndarray:
    """The PLMS evaluation timetable (model is called len(result) times).

    Mirrors diffusers PNDMScheduler.set_timesteps with skip_prk_steps=True:
    base grid arange(n)*ratio + offset, with the second-to-last entry
    duplicated (the counter==1 re-evaluation) and reversed to descending.
    """
    ratio = cfg.num_train_timesteps // num_inference_steps
    base = (np.arange(0, num_inference_steps) * ratio).round().astype(
        np.int64) + cfg.steps_offset
    seq = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
    return seq.copy()


class PLMSState(NamedTuple):
    ets: jnp.ndarray        # (4, ...) ring buffer of eps predictions
    ets_count: jnp.ndarray  # () int32 — number of valid entries
    counter: jnp.ndarray    # () int32 — step counter (diffusers semantics)
    cur_sample: jnp.ndarray  # stashed sample for the counter==1 correction


def plms_init(sample_shape, dtype=jnp.float32) -> PLMSState:
    return PLMSState(
        ets=jnp.zeros((4,) + tuple(sample_shape), dtype),
        ets_count=jnp.zeros((), jnp.int32),
        counter=jnp.zeros((), jnp.int32),
        cur_sample=jnp.zeros(sample_shape, dtype),
    )


def _prev_sample(sample, t, t_prev, eps, acp, cfg: SchedulerConfig):
    final_acp = jnp.float32(1.0) if cfg.set_alpha_to_one else acp[0]
    a_t = acp[t]
    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], final_acp)
    b_t = 1.0 - a_t
    b_prev = 1.0 - a_prev
    sample_coeff = jnp.sqrt(a_prev / a_t)
    denom = a_t * jnp.sqrt(b_prev) + jnp.sqrt(a_t * b_t * a_prev)
    return sample_coeff * sample - (a_prev - a_t) * eps / denom


def plms_step(state: PLMSState, sample, eps, t, num_inference_steps: int,
              acp, cfg: SchedulerConfig = SchedulerConfig()):
    """One PLMS update. Returns (new_state, prev_sample).

    `t` is the entry from plms_timesteps for this call; all branching is on
    traced scalars via jnp.where, so this inlines into lax.scan.
    """
    ratio = cfg.num_train_timesteps // num_inference_steps
    counter = state.counter
    is_second = counter == 1

    t_prev = jnp.where(is_second, t, t - ratio)
    t_eval = jnp.where(is_second, t + ratio, t)

    # push eps into the ring buffer unless this is the counter==1 correction
    new_ets = jnp.where(is_second, state.ets,
                        jnp.concatenate([state.ets[1:], eps[None]], axis=0))
    new_count = jnp.where(is_second, state.ets_count,
                          jnp.minimum(state.ets_count + 1, 4))

    e1 = new_ets[-1]
    e2 = new_ets[-2]
    e3 = new_ets[-3]
    e4 = new_ets[-4]
    order1 = e1
    order1b = (eps + e1) / 2.0           # counter==1 correction
    order2 = (3.0 * e1 - e2) / 2.0
    order3 = (23.0 * e1 - 16.0 * e2 + 5.0 * e3) / 12.0
    order4 = (55.0 * e1 - 59.0 * e2 + 37.0 * e3 - 9.0 * e4) / 24.0

    eps_prime = jnp.where(
        (new_count == 1) & (counter == 0), order1,
        jnp.where((new_count == 1) & is_second, order1b,
                  jnp.where(new_count == 2, order2,
                            jnp.where(new_count == 3, order3, order4))))

    use_sample = jnp.where(is_second, state.cur_sample, sample)
    new_cur = jnp.where(counter == 0, sample, state.cur_sample)

    prev = _prev_sample(use_sample, t_eval, t_prev, eps_prime, acp, cfg)
    return PLMSState(new_ets, new_count, counter + 1, new_cur), prev


def ddim_timesteps(num_inference_steps: int,
                   cfg: SchedulerConfig = SchedulerConfig()) -> np.ndarray:
    ratio = cfg.num_train_timesteps // num_inference_steps
    return ((np.arange(0, num_inference_steps) * ratio).round().astype(
        np.int64) + cfg.steps_offset)[::-1].copy()


def ddim_step(sample, eps, t, num_inference_steps: int, acp,
              cfg: SchedulerConfig = SchedulerConfig()):
    """Deterministic DDIM (eta=0) update, diffusers convention."""
    ratio = cfg.num_train_timesteps // num_inference_steps
    t_prev = t - ratio
    final_acp = jnp.float32(1.0) if cfg.set_alpha_to_one else acp[0]
    a_t = acp[t]
    a_prev = jnp.where(t_prev >= 0, acp[jnp.maximum(t_prev, 0)], final_acp)
    x0 = (sample - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps


def add_noise(original, noise, t, acp):
    a = acp[t]
    return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise

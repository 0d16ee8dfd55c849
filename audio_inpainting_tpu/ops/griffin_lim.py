"""Griffin-Lim phase reconstruction as a jitted lax.fori_loop.

Behavioral equivalent of ``torchaudio.transforms.GriffinLim(n_fft=2048,
hop_length=512, power=1.0)`` used by the diffusion pipeline
(reference main_diffusion_gap.py:73-74): 32 iterations, momentum 0.99,
random phase init. Each iteration is one iSTFT + STFT — two matmul pairs on
the MXU — so the whole loop stays on-device inside one jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stft import StftConfig, istft, polar, stft, torch_stft_config


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _griffin_lim(mag: jax.Array, key: jax.Array, cfg: StftConfig, length: int,
                 n_iter: int, momentum: float) -> jax.Array:
    init_phase = jax.random.uniform(key, mag.shape, minval=-jnp.pi, maxval=jnp.pi)
    z0 = polar(mag, init_phase)

    def body(_, carry):
        z, prev = carry
        # rebuild with current phase estimate, momentum-accelerated
        inv = istft(z, cfg, length)
        rebuilt = stft(inv, cfg)
        # guard against shape drift from padding: crop to mag's frame count
        rebuilt = rebuilt[:, : mag.shape[1]]
        tprev = rebuilt
        rebuilt = rebuilt - (momentum / (1.0 + momentum)) * prev
        angle = rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-16)
        return mag * angle, tprev

    z, _ = jax.lax.fori_loop(0, n_iter, body, (z0, jnp.zeros_like(z0)))
    return istft(z, cfg, length)


def griffin_lim(mag, n_fft: int = 2048, hop: int = 512, n_iter: int = 32,
                momentum: float = 0.99, length: int | None = None,
                power: float = 1.0, seed: int = 0) -> jax.Array:
    """Reconstruct a waveform from a (n_bins, n_frames) magnitude spectrogram.

    ``power``: exponent of the input spectrogram; 1.0 means ``mag`` is already
    linear magnitude (the diffusion codec's convention).
    """
    mag = jnp.asarray(mag, dtype=jnp.float32)
    if power != 1.0:
        mag = mag ** (1.0 / power)
    if length is None:
        length = hop * (mag.shape[1] - 1)
    cfg = torch_stft_config(n_fft, hop)
    key = jax.random.PRNGKey(seed)
    return _griffin_lim(mag, key, cfg, int(length), int(n_iter), float(momentum))

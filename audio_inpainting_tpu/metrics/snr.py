"""L4 quality metrics, formalizing what the reference printed but never asserted.

SNR formulas replicate the inline computations duplicated in four reference
scripts (main1_gp.py:98-109, main2_AR.py:106-116, main3_AR_text.py:110-120,
main4_NMF.py:99-110): global SNR over the full segment and "local" SNR over
the gap only, both with a 1e-10 denominator guard. LSD is added as the
standard spectral metric for the BASELINE.md parity table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.stft import torch_stft_config, stft


@jax.jit
def snr_db(reference: jax.Array, estimate: jax.Array) -> jax.Array:
    """Global SNR: 10*log10(sum(ref^2) / (sum((ref-est)^2) + 1e-10))."""
    reference = jnp.asarray(reference, jnp.float32)
    estimate = jnp.asarray(estimate, jnp.float32)
    num = jnp.sum(reference**2)
    den = jnp.sum((reference - estimate) ** 2)
    return 10.0 * jnp.log10(num / (den + 1e-10))


def local_snr_db(reference, estimate, gap_start: int, gap_end: int) -> jax.Array:
    """SNR restricted to the gap region (reference's 'Local SNR')."""
    return snr_db(reference[gap_start:gap_end], estimate[gap_start:gap_end])


def lsd_db(reference, estimate, n_fft: int = 1024, hop: int = 256) -> jax.Array:
    """Log-spectral distance in dB: mean over frames of the RMS over bins of
    the difference of 10*log10 power spectra."""
    cfg = torch_stft_config(n_fft, hop)
    ref_p = jnp.abs(stft(jnp.asarray(reference, jnp.float32), cfg)) ** 2
    est_p = jnp.abs(stft(jnp.asarray(estimate, jnp.float32), cfg)) ** 2
    log_ref = 10.0 * jnp.log10(jnp.maximum(ref_p, 1e-10))
    log_est = 10.0 * jnp.log10(jnp.maximum(est_p, 1e-10))
    return jnp.mean(jnp.sqrt(jnp.mean((log_ref - log_est) ** 2, axis=0)))

"""Metric formulas pinned against the reference's inline numpy computations."""

import numpy as np
import jax.numpy as jnp

from audio_inpainting_tpu.metrics import snr_db, local_snr_db, lsd_db


def _ref_snr(ref, est):
    num = np.sum(ref**2)
    den = np.sum((ref - est) ** 2)
    return 10 * np.log10(num / (den + 1e-10))


def test_snr_matches_reference_formula():
    rng = np.random.RandomState(0)
    ref = rng.randn(5000).astype(np.float32)
    est = ref + 0.1 * rng.randn(5000).astype(np.float32)
    np.testing.assert_allclose(float(snr_db(ref, est)), _ref_snr(ref, est), rtol=1e-4)


def test_local_snr():
    rng = np.random.RandomState(1)
    ref = rng.randn(5000).astype(np.float32)
    est = ref.copy()
    est[1000:1500] += 0.5 * rng.randn(500).astype(np.float32)
    local = float(local_snr_db(ref, est, 1000, 1500))
    np.testing.assert_allclose(local, _ref_snr(ref[1000:1500], est[1000:1500]), rtol=1e-4)
    assert float(snr_db(ref, est)) > local  # error concentrated in the gap


def test_perfect_reconstruction_snr_is_huge():
    x = np.sin(np.linspace(0, 30, 4000)).astype(np.float32)
    assert float(snr_db(x, x)) > 80


def test_lsd_zero_for_identical_and_positive_otherwise():
    rng = np.random.RandomState(2)
    x = rng.randn(44100).astype(np.float32)
    assert float(lsd_db(x, x)) < 1e-3
    y = x + 0.3 * rng.randn(44100).astype(np.float32)
    assert float(lsd_db(x, y)) > 0.5

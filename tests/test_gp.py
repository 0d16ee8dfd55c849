"""GP inpainting: posterior correctness on small problems + quality gates."""

import numpy as np
import jax

from audio_inpainting_tpu.methods.gp import GPConfig, gp_fit_predict, gp_restore
from audio_inpainting_tpu.metrics import local_snr_db


def test_posterior_matches_sklearn_at_fixed_hyperparameters():
    """With optimization disabled (opt_steps=0, n_restarts=0) the posterior
    must match sklearn's GP at the same kernel values."""
    from sklearn.gaussian_process import GaussianProcessRegressor
    from sklearn.gaussian_process.kernels import (
        RBF, ExpSineSquared, WhiteKernel, ConstantKernel)

    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(0, 0.05, 120)).astype(np.float64)
    y = np.sin(2 * np.pi * 200 * x) + 0.05 * rng.randn(120)
    xs = np.linspace(0.01, 0.04, 37)

    kernel = (ConstantKernel(1.0, "fixed") * RBF(0.002, "fixed")
              * ExpSineSquared(1.0, 0.005, "fixed", "fixed")
              + WhiteKernel(0.01, "fixed"))
    gp = GaussianProcessRegressor(kernel=kernel, optimizer=None, normalize_y=True)
    gp.fit(x.reshape(-1, 1), y)
    mu_sk, std_sk = gp.predict(xs.reshape(-1, 1), return_std=True)

    cfg = GPConfig(n_restarts=0, opt_steps=0)
    mu, std, theta = gp_fit_predict(x, y, xs, cfg, key=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(mu), mu_sk, atol=2e-3)
    np.testing.assert_allclose(np.asarray(std), std_sk, atol=2e-3)


def test_gp_restore_sine_gap():
    # small n + few restarts: CPU test budget (production runs on TPU)
    sr = 16000
    n = 320
    t = np.arange(n) / sr
    x = (0.5 * np.sin(2 * np.pi * 200 * t)
         + 0.3 * np.sin(2 * np.pi * 450 * t)).astype(np.float32)
    mask = np.ones(n, bool)
    gs, ge = int(n * 0.4), int(n * 0.4) + int(n * 0.2)
    mask[gs:ge] = False
    cfg = GPConfig(n_restarts=2, opt_steps=60)
    restored, std = gp_restore(x, mask, sr, cfg, key=jax.random.PRNGKey(0))
    assert std.shape == (ge - gs,)
    assert float(local_snr_db(x, restored, gs, ge)) > 10.0
    # valid samples untouched
    np.testing.assert_array_equal(restored[mask], x[mask])

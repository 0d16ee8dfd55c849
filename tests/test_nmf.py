"""NMF multiplicative updates: reconstruction quality vs sklearn CD oracle."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_inpainting_tpu.methods.nmf import (
    NMFConfig,
    nmf_reconstruct,
    nmf_inpaint_columns,
    nmf_inpaint_iterative,
)


def _toy_mag(f=65, t=120, k_true=5, seed=0):
    rng = np.random.RandomState(seed)
    w = np.abs(rng.randn(f, k_true))
    h = np.abs(rng.randn(k_true, t))
    return (w @ h).astype(np.float32)


def test_reconstruction_error_close_to_sklearn():
    from sklearn.decomposition import NMF

    v = _toy_mag()
    cfg = NMFConfig(n_components=8, n_iter=200)
    v_hat = np.asarray(nmf_reconstruct(jnp.asarray(v), cfg, jax.random.PRNGKey(0)))
    err_ours = np.linalg.norm(v - v_hat) / np.linalg.norm(v)

    sk = NMF(n_components=8, init="random", random_state=0, max_iter=200)
    w = sk.fit_transform(v)
    err_sk = np.linalg.norm(v - w @ sk.components_) / np.linalg.norm(v)

    assert v_hat.min() >= 0
    # multiplicative updates should land within 20% relative of CD's error
    assert err_ours < max(err_sk * 1.2, err_sk + 0.02), (err_ours, err_sk)


def test_inpaint_columns_preserves_good_and_fills_bad():
    v = _toy_mag(seed=1)
    bad = np.zeros(v.shape[1], bool)
    bad[50:60] = True
    damaged = v.copy()
    damaged[:, bad] = 0
    cfg = NMFConfig(n_components=8, n_iter=200)
    out = np.asarray(nmf_inpaint_columns(jnp.asarray(damaged), jnp.asarray(bad),
                                         cfg, jax.random.PRNGKey(0)))
    # untouched good columns
    np.testing.assert_array_equal(out[:, ~bad], damaged[:, ~bad])
    # bad columns closer to truth than the zeros were
    err_before = np.linalg.norm(v[:, bad])
    err_after = np.linalg.norm(v[:, bad] - out[:, bad])
    assert err_after < 0.6 * err_before, (err_after, err_before)


def test_inpaint_iterative_part0_scheme():
    v = _toy_mag(seed=2)
    cs, ce = 40, 60
    damaged = v.copy()
    damaged[:, cs:ce] = 0
    cfg = NMFConfig(n_components=8, n_iter=100, outer_iters=10)
    out = np.asarray(nmf_inpaint_iterative(jnp.asarray(damaged), cs, ce, cfg,
                                           jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(out[:, :cs], damaged[:, :cs])
    np.testing.assert_array_equal(out[:, ce:], damaged[:, ce:])
    err_after = np.linalg.norm(v[:, cs:ce] - out[:, cs:ce])
    assert err_after < 0.6 * np.linalg.norm(v[:, cs:ce])


def test_deterministic_under_key():
    v = _toy_mag(seed=3)
    cfg = NMFConfig(n_components=6, n_iter=50)
    a = np.asarray(nmf_reconstruct(jnp.asarray(v), cfg, jax.random.PRNGKey(5)))
    b = np.asarray(nmf_reconstruct(jnp.asarray(v), cfg, jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(a, b)

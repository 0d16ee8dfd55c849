"""Linear interpolation vs np.interp / np.linspace oracles."""

import numpy as np
import jax.numpy as jnp

from audio_inpainting_tpu.methods import linear_interp_masked, linear_fill_gap


def test_masked_interp_matches_np_interp():
    rng = np.random.RandomState(0)
    x = rng.randn(5000).astype(np.float32)
    mask = np.ones(5000, dtype=bool)
    for s, e in [(100, 400), (1000, 1010), (4500, 4999)]:
        mask[s:e] = False
    got = np.asarray(linear_interp_masked(jnp.asarray(x), jnp.asarray(mask)))
    xi = np.arange(5000)
    expected = x.copy()
    expected[~mask] = np.interp(xi[~mask], xi[mask], x[mask])
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_masked_interp_edge_clamping():
    x = np.array([0, 0, 3.0, 4.0, 0, 0], dtype=np.float32)
    mask = np.array([False, False, True, True, False, False])
    got = np.asarray(linear_interp_masked(jnp.asarray(x), jnp.asarray(mask)))
    xi = np.arange(6)
    expected = x.copy()
    expected[~mask] = np.interp(xi[~mask], xi[mask], x[mask])
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_linear_fill_gap_matches_linspace():
    rng = np.random.RandomState(1)
    x = rng.randn(1000).astype(np.float32)
    s, e = 300, 700
    got = np.asarray(linear_fill_gap(jnp.asarray(x), s, e))
    expected = x.copy()
    expected[s:e] = np.linspace(x[s - 1], x[e], e - s)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_host_twin_matches_device_kernel():
    """api.restore's linear branch uses the host np.interp twin; it must
    match the jitted kernel (which is itself np.interp-oracle-tested)."""
    from audio_inpainting_tpu.methods.linear import (linear_interp_masked,
                                                     linear_interp_masked_host)

    rng = np.random.default_rng(3)
    x = rng.standard_normal(5000).astype(np.float32)
    mask = np.ones(5000, bool)
    mask[100:400] = False
    mask[4000:4800] = False
    mask[:30] = False          # leading edge: clamp semantics
    a = np.asarray(linear_interp_masked(x, mask))
    b = linear_interp_masked_host(x, mask)
    np.testing.assert_allclose(a, b, atol=1e-6)
    # degenerate cases
    np.testing.assert_array_equal(linear_interp_masked_host(x, np.ones(5000, bool)), x)
    assert np.isfinite(linear_interp_masked_host(x, np.zeros(5000, bool))).all()

"""Pallas AR recurrence kernel vs the lax.scan reference (interpret mode on
CPU; on real TPU the AR method dispatches to the compiled kernel)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_inpainting_tpu.ops.pallas.ar_scan import ar_extrapolate_pallas


@pytest.mark.parametrize("B,order,steps", [(5, 30, 300), (2, 100, 700),
                                           (9, 7, 129)])
def test_kernel_matches_scan_semantics(B, order, steps):
    rng = np.random.RandomState(B + order)
    w = jnp.asarray(rng.randn(B, order).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(B).astype(np.float32) * 0.01)
    std = jnp.asarray(np.abs(rng.randn(B)).astype(np.float32) * 0.1)
    gain = jnp.asarray((rng.rand(B) > 0.2).astype(np.float32))
    state0 = jnp.asarray(rng.randn(B, order).astype(np.float32))
    eps = jnp.asarray(rng.randn(B, steps).astype(np.float32))

    def scan_ref():
        def step(state, e):
            pred = (jnp.einsum("bo,bo->b", state, w) + b + std * e) * gain
            state = jnp.concatenate([state[:, 1:], pred[:, None]], axis=1)
            return state, pred

        _, preds = jax.lax.scan(step, state0, eps.T)
        return preds.T

    expected = np.asarray(scan_ref())
    got = np.asarray(ar_extrapolate_pallas(state0, w, b, std, gain, eps,
                                           steps, interpret=True))
    np.testing.assert_allclose(got, expected, atol=1e-4)

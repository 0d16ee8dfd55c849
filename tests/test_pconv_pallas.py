"""Pallas packed-conv kernels vs the XLA band-conv oracle (interpret mode).

ops/pallas/pconv.py must match ops.packedconv.conv3x3_packed exactly
(forward, input grad, weight grad) — including non-divisible tile heights
(the kernels mask the last partial H tile) and bf16 compute.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audio_inpainting_tpu.ops.packedconv import conv3x3_packed, pack
from audio_inpainting_tpu.ops.pallas.pconv import conv3x3_packed_pl


@pytest.mark.parametrize("h,w,ci,co", [
    (13, 16, 16, 16),    # partial last tile
    (16, 32, 4, 8),      # small channels
    (33, 24, 16, 32),    # channel expansion + partial tile
    (32, 64, 32, 16),    # contraction
])
def test_pconv_matches_xla_band_conv(h, w, ci, co):
    rng = np.random.RandomState(0)
    xp = pack(jnp.asarray(rng.randn(1, h, w, ci), jnp.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
    ref = conv3x3_packed(xp, k)
    got = conv3x3_packed_pl(xp, k, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    dref = jax.grad(lambda a, b: jnp.sum(conv3x3_packed(a, b) * g),
                    argnums=(0, 1))(xp, k)
    dgot = jax.grad(lambda a, b: jnp.sum(conv3x3_packed_pl(a, b, True) * g),
                    argnums=(0, 1))(xp, k)
    np.testing.assert_allclose(np.asarray(dgot[0]), np.asarray(dref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dgot[1]), np.asarray(dref[1]),
                               atol=1e-3, rtol=1e-4)


def test_pconv_bf16_path():
    rng = np.random.RandomState(1)
    xp = pack(jnp.asarray(rng.randn(1, 12, 32, 16), jnp.bfloat16))
    k = jnp.asarray(rng.randn(3, 3, 16, 16), jnp.float32)
    ref = conv3x3_packed(xp, k).astype(jnp.float32)
    got = conv3x3_packed_pl(xp, k, True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("h,w,ci,co", [(13, 16, 16, 16), (16, 32, 4, 8),
                                       (33, 24, 16, 32)])
def test_dense_band_kernel_matches_band_conv(h, w, ci, co):
    """conv3x3_packed_dense (one plain XLA conv with the band structure
    baked into a (3,3,B*Ci,B*Co) kernel) == the explicit band-matmul path,
    forward and both gradients (autodiff through the kernel build)."""
    from audio_inpainting_tpu.ops.packedconv import conv3x3_packed_dense

    rng = np.random.RandomState(7)
    xp = pack(jnp.asarray(rng.randn(1, h, w, ci), jnp.float32))
    k = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
    ref = conv3x3_packed(xp, k)
    got = conv3x3_packed_dense(xp, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    dref = jax.grad(lambda a, b: jnp.sum(conv3x3_packed(a, b) * g),
                    argnums=(0, 1))(xp, k)
    dgot = jax.grad(lambda a, b: jnp.sum(conv3x3_packed_dense(a, b) * g),
                    argnums=(0, 1))(xp, k)
    np.testing.assert_allclose(np.asarray(dgot[0]), np.asarray(dref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dgot[1]), np.asarray(dref[1]),
                               atol=1e-3, rtol=1e-4)

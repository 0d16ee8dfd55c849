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


@pytest.fixture(autouse=True)
def _drop_compiled_programs_between_tests():
    """Per-TEST cache drop (stronger than conftest's per-module drop).

    This module compiles the largest programs in the suite (dense
    conv4x4s2 grads, interpret-mode pallas twins); it is where the
    aged-process XLA:CPU backend_compile_and_load segfault still
    reproduces when only module-boundary clearing bounds the executable
    population. Each test recompiles from scratch — slower, but immune.
    """
    yield
    jax.clear_caches()


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


def _assert_op_pair(ref_op, dense_op, xp, k, datol=1e-3):
    """Forward + both gradients of the dense-kernel twin == band-matmul op."""
    rng = np.random.RandomState(3)
    ref = ref_op(xp, k)
    got = dense_op(xp, k)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)
    dref = jax.grad(lambda a, b: jnp.sum(ref_op(a, b) * g),
                    argnums=(0, 1))(xp, k)
    dgot = jax.grad(lambda a, b: jnp.sum(dense_op(a, b) * g),
                    argnums=(0, 1))(xp, k)
    np.testing.assert_allclose(np.asarray(dgot[0]), np.asarray(dref[0]),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dgot[1]), np.asarray(dref[1]),
                               atol=datol, rtol=1e-4)


@pytest.mark.parametrize("h,w,ci,co", [(8, 16, 16, 8), (13, 32, 64, 32),
                                       (5, 48, 32, 16)])
def test_dense_transpose2x2_matches_packed(h, w, ci, co):
    """conv_transpose2x2_packed_dense (one lax.conv_transpose with the lane
    scatter baked into a (2,2,B*Ci,B*Co) kernel) == the interleaving-matmul
    path, forward and both gradients."""
    from audio_inpainting_tpu.ops.packedconv import (
        conv_transpose2x2_packed, conv_transpose2x2_packed_dense)

    rng = np.random.RandomState(11)
    xp = pack(jnp.asarray(rng.randn(1, h, w, ci), jnp.float32))
    k = jnp.asarray(rng.randn(2, 2, ci, co), jnp.float32)
    _assert_op_pair(conv_transpose2x2_packed, conv_transpose2x2_packed_dense,
                    xp, k)


@pytest.mark.parametrize("h,w,ci,co", [(8, 32, 16, 32), (14, 64, 32, 64),
                                       (6, 96, 16, 16)])
def test_dense_conv4x4s2_matches_packed(h, w, ci, co):
    """conv4x4s2_packed_dense (one plain stride-2 XLA conv with the boundary
    -column band structure in a (4,4,B*Ci,B*Co) kernel) == the banded-matmul
    path (the reference discriminator's op), forward and both gradients."""
    from audio_inpainting_tpu.ops.packedconv import (conv4x4s2_packed,
                                                     conv4x4s2_packed_dense)

    rng = np.random.RandomState(13)
    xp = pack(jnp.asarray(rng.randn(1, h, w, ci), jnp.float32))
    k = jnp.asarray(rng.randn(4, 4, ci, co), jnp.float32)
    _assert_op_pair(conv4x4s2_packed, conv4x4s2_packed_dense, xp, k,
                    datol=3e-3)

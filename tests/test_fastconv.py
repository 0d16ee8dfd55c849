"""conv3x3_same custom VJP vs XLA autodiff oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_inpainting_tpu.ops.fastconv import conv3x3_same


def _conv_ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_forward_matches_xla():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 17, 23, 5).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 5, 7).astype(np.float32))
    np.testing.assert_allclose(np.asarray(conv3x3_same(x, k)),
                               np.asarray(_conv_ref(x, k)), atol=1e-4)


def test_gradients_match_xla_autodiff():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 20, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))
    tgt = jnp.asarray(rng.randn(1, 12, 20, 6).astype(np.float32))

    def loss_fast(x_, k_):
        return jnp.mean((conv3x3_same(x_, k_) - tgt) ** 2)

    def loss_ref(x_, k_):
        return jnp.mean((_conv_ref(x_, k_) - tgt) ** 2)

    gx1, gk1 = jax.grad(loss_fast, argnums=(0, 1))(x, k)
    gx2, gk2 = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), atol=1e-4)


def test_diffusion_unet_still_trains():
    from audio_inpainting_tpu.models.diffusion_unet import DiffusionUNet

    m = DiffusionUNet(base=16)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.zeros((2,))
    p = m.init(jax.random.PRNGKey(0), x, t)["params"]
    y = m.apply({"params": p}, x, t)
    assert y.shape == x.shape
    g = jax.grad(lambda pp: jnp.mean(m.apply({"params": pp}, x, t) ** 2))(p)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_wpack_matches_reference_conv_and_grads():
    from audio_inpainting_tpu.ops.fastconv import conv3x3_same, conv3x3_wpack

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 13, 29, 16), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 16, 8) * 0.1, jnp.float32)
    g = jnp.asarray(rng.randn(2, 13, 29, 8), jnp.float32)

    y_ref = conv3x3_same(x, k)
    y = conv3x3_wpack(x, k)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)

    _, vjp_ref = jax.vjp(conv3x3_same, x, k)
    _, vjp = jax.vjp(conv3x3_wpack, x, k)
    for a, b in zip(vjp(g), vjp_ref(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fast_dispatch_picks_wpack_in_small_channel_regime():
    from audio_inpainting_tpu.ops.fastconv import conv3x3_fast

    rng = np.random.RandomState(8)
    for ci, co in ((1, 16), (16, 16), (64, 64)):
        x = jnp.asarray(rng.randn(1, 8, 24, ci), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
        y = conv3x3_fast(x, k)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

"""Packed-activation models (models/packed_unet.py) vs the standard ones.

The packed twins share the exact parameter tree with SimpleUNet /
GeneratorUNet; on the same params they must produce the same outputs (up
to f32 accumulation-order noise) and the same BatchNorm running-stat
updates.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audio_inpainting_tpu.models.packed_unet import (PackedGeneratorUNet,
                                                     PackedSimpleUNet)
from audio_inpainting_tpu.models.unet import GeneratorUNet, SimpleUNet
from audio_inpainting_tpu.ops.packedconv import (conv3x3_packed, pack,
                                                 unpack)


def test_conv3x3_packed_matches_xla_conv_and_grads():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 64, 16), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 16, 8) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = unpack(conv3x3_packed(pack(x), k), 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    g = jnp.asarray(rng.randn(*ref.shape), jnp.float32)

    def loss_ref(x, k):
        return jnp.sum(jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) * g)

    def loss_packed(x, k):
        return jnp.sum(unpack(conv3x3_packed(pack(x), k), 8) * g)

    for a, b in zip(jax.grad(loss_packed, (0, 1))(x, k),
                    jax.grad(loss_ref, (0, 1))(x, k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_packed_simple_unet_matches_standard():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 64, 1), jnp.float32)
    std = SimpleUNet()
    params = std.init(jax.random.PRNGKey(0), x)["params"]
    ref = std.apply({"params": params}, x)
    packed = PackedSimpleUNet()
    # identical param tree: the packed twin consumes the standard params
    out = packed.apply({"params": params}, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_packed_generator_matches_standard_train_and_eval():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 64, 1), jnp.float32)
    std = GeneratorUNet()
    v = std.init(jax.random.PRNGKey(0), x, True)
    packed = PackedGeneratorUNet()
    v2 = packed.init(jax.random.PRNGKey(0), x, True)
    # same tree structure both ways
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v2["params"]))
    assert (jax.tree_util.tree_structure(v["batch_stats"])
            == jax.tree_util.tree_structure(v2["batch_stats"]))

    ref, upd_ref = std.apply(v, x, True, mutable=["batch_stats"])
    out, upd = packed.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(upd["batch_stats"]),
                    jax.tree_util.tree_leaves(upd_ref["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    ref_e = std.apply(v, x, False)
    out_e = packed.apply(v, x, False)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(ref_e),
                               rtol=1e-4, atol=1e-4)


def test_packed_discriminator_matches_standard():
    from audio_inpainting_tpu.models.packed_unet import PackedDiscriminator
    from audio_inpainting_tpu.models.unet import Discriminator

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 20, 64, 1), jnp.float32)
    std = Discriminator()
    v = std.init(jax.random.PRNGKey(0), x, True)
    packed = PackedDiscriminator()
    v2 = packed.init(jax.random.PRNGKey(0), x, True)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v2["params"]))
    ref, upd_ref = std.apply(v, x, True, mutable=["batch_stats"])
    out, upd = packed.apply(v, x, True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(upd["batch_stats"]),
                    jax.tree_util.tree_leaves(upd_ref["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_band_kernel_gather_matches_concat_build():
    """The single-gather band-kernel build (AIT_BAND_GATHER=1 candidate)
    is bitwise-identical to the shipped concat build for every conv shape
    the models use."""
    from audio_inpainting_tpu.ops.packedconv import (_band_kernel,
                                                     _band_kernel_gather)

    rng = np.random.RandomState(3)
    for ci, co in [(1, 16), (16, 16), (16, 32), (32, 64), (64, 32), (48, 16)]:
        k = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
        np.testing.assert_array_equal(np.asarray(_band_kernel_gather(k)),
                                      np.asarray(_band_kernel(k)))



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


def test_kbuild_einsum_matches_scatter(monkeypatch):
    """AIT_KBUILD_EINSUM=1 replaces every kernel build (3x3 band, stride-2
    band, transpose blocks, 1x1 block-diagonal) with one one-hot einsum.
    Forward outputs must be bitwise-equal (each build element receives
    exactly one 1.0*k term); the conv3x3 weight grad may reassociate its
    8-term band fold, so it gets an ulp-level tolerance."""
    import os

    from audio_inpainting_tpu.ops.packedconv import (
        conv1x1_packed, conv3x3_packed, conv4x4s2_packed,
        conv_transpose2x2_packed)

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 8, 64, 16), jnp.float32)
    xp = pack(x)
    k3 = jnp.asarray(rng.randn(3, 3, 16, 8) * 0.1, jnp.float32)
    k4 = jnp.asarray(rng.randn(4, 4, 16, 8) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(2, 2, 16, 8) * 0.1, jnp.float32)
    k1 = jnp.asarray(rng.randn(16, 8) * 0.1, jnp.float32)
    g3 = jnp.asarray(rng.randn(1, 8, 8, 8 * 8), jnp.float32)

    def run_all():
        jax.clear_caches()   # env var is read at trace time
        outs = [conv3x3_packed(xp, k3), conv4x4s2_packed(xp, k4),
                conv_transpose2x2_packed(xp, k2), conv1x1_packed(xp, k1)]
        grads = jax.grad(
            lambda a, b: jnp.sum(conv3x3_packed(a, b) * g3), (0, 1))(xp, k3)
        return [np.asarray(o) for o in outs], [np.asarray(d) for d in grads]

    monkeypatch.delenv("AIT_KBUILD_EINSUM", raising=False)
    outs_s, grads_s = run_all()
    monkeypatch.setenv("AIT_KBUILD_EINSUM", "1")
    outs_e, grads_e = run_all()
    monkeypatch.delenv("AIT_KBUILD_EINSUM", raising=False)
    jax.clear_caches()

    for s, e in zip(outs_s, outs_e):
        np.testing.assert_array_equal(s, e)
    np.testing.assert_array_equal(grads_s[0], grads_e[0])      # dx: band build only
    np.testing.assert_allclose(grads_s[1], grads_e[1],         # dk: 8-term fold
                               rtol=1e-6, atol=1e-6)

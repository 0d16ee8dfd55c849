"""Flat-vector Adam (ops/flatopt.py) vs optax.adam equivalence.

The flat form must be numerically identical to optax's per-leaf tree map:
same update formula applied elementwise, only the storage layout differs.
Also pins that the GAN/U-Net chunks produce the same training trajectory
with flat_opt on and off (the round-3 op-count optimization must not
change results, only device time).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audio_inpainting_tpu.ops import flatopt


def _tree(seed=0):
    r = np.random.RandomState(seed)
    return {
        "a": {"kernel": jnp.asarray(r.randn(3, 3, 4, 8), jnp.float32),
              "bias": jnp.asarray(r.randn(8), jnp.float32)},
        "b": {"scale": jnp.asarray(r.randn(17), jnp.float32)},
    }


def test_flat_roundtrip():
    t = _tree()
    spec = flatopt.make_spec(t)
    back = flatopt.from_flat(flatopt.to_flat(t), spec)
    for l1, l2 in zip(jax.tree_util.tree_leaves(t),
                      jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


@pytest.mark.parametrize("b1,b2", [(0.9, 0.999), (0.5, 0.999)])
def test_adam_matches_optax(b1, b2):
    lr = 2e-4
    params = _tree(1)
    spec = flatopt.make_spec(params)
    tx = optax.adam(lr, b1=b1, b2=b2)
    opt_state = tx.init(params)
    pf = flatopt.to_flat(params)
    fs = flatopt.optax_to_flat(opt_state, spec)

    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda l: jnp.sin(l * (step + 1)), _tree(2))
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        pf, fs = flatopt.adam_step(pf, flatopt.to_flat(grads), fs,
                                   lr, b1, b2)

    flat_params = flatopt.from_flat(pf, spec)
    for l1, l2 in zip(jax.tree_util.tree_leaves(params),
                      jax.tree_util.tree_leaves(flat_params)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=0, atol=1e-7)
    # state converts back to the optax structure with matching values
    rebuilt = flatopt.flat_to_optax(fs, spec, opt_state)
    assert int(rebuilt[0].count) == int(opt_state[0].count)
    for l1, l2 in zip(jax.tree_util.tree_leaves(opt_state[0].mu),
                      jax.tree_util.tree_leaves(rebuilt[0].mu)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=0, atol=1e-7)


def test_unet_chunk_flat_matches_per_leaf():
    from audio_inpainting_tpu.methods.neural import (UNetTrainConfig, _nhwc,
                                                     _pad4, _unet_train_chunk,
                                                     _valid4)
    from audio_inpainting_tpu.models.packed_unet import PackedSimpleUNet

    r = np.random.RandomState(0)
    norm = jnp.asarray(r.rand(36, 96), jnp.float32)
    tgt2d, (f0, t0) = _pad4(norm)
    msk2d, _ = _pad4((norm > 0.3).astype(jnp.float32), value=1.0)
    inp, tgt, msk = (_nhwc(tgt2d * msk2d), _nhwc(tgt2d), _nhwc(msk2d))
    vld = _nhwc(_valid4(f0, t0))

    outs = {}
    for flat in (True, False):
        cfg = UNetTrainConfig(flat_opt=flat)
        params = PackedSimpleUNet().init(jax.random.PRNGKey(0), inp)["params"]
        opt_state = optax.adam(cfg.lr).init(params)
        p, st, losses = _unet_train_chunk(params, opt_state, inp, tgt, msk,
                                          vld, cfg, 5)
        outs[flat] = (p, losses)

    np.testing.assert_allclose(np.asarray(outs[True][1]),
                               np.asarray(outs[False][1]), rtol=0, atol=1e-7)
    for l1, l2 in zip(jax.tree_util.tree_leaves(outs[True][0]),
                      jax.tree_util.tree_leaves(outs[False][0])):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=0, atol=1e-6)


@pytest.mark.parametrize("bf16", [False, True])
def test_gan_chunk_flat_matches_per_leaf(bf16):
    from audio_inpainting_tpu.methods.neural import (GANTrainConfig,
                                                     _d_model,
                                                     _gan_train_chunk, _nhwc,
                                                     _pad4, _valid4)
    from audio_inpainting_tpu.models.packed_unet import PackedGeneratorUNet

    r = np.random.RandomState(0)
    norm = jnp.asarray(r.rand(36, 96) * 2 - 1, jnp.float32)
    inp2d, (f0, t0) = _pad4(norm, value=-1.0)
    msk2d, _ = _pad4((norm > -0.5).astype(jnp.float32), value=1.0)
    inp, msk = _nhwc(inp2d), _nhwc(msk2d)
    vld = _nhwc(_valid4(f0, t0))

    outs = {}
    for flat in (True, False):
        cfg = GANTrainConfig(flat_opt=flat, bf16=bf16)
        kg, kd = jax.random.split(jax.random.PRNGKey(0))
        g_vars = PackedGeneratorUNet().init(kg, inp, True)
        d_vars = _d_model(cfg).init(kd, inp, True)
        tx = optax.adam(cfg.lr, b1=cfg.b1, b2=cfg.b2)
        state = (g_vars["params"], g_vars["batch_stats"],
                 tx.init(g_vars["params"]), d_vars["params"],
                 d_vars["batch_stats"], tx.init(d_vars["params"]))
        state, (dl, gl) = _gan_train_chunk(state, inp, inp, msk, vld, cfg, 4)
        outs[flat] = (state, dl, gl)

    np.testing.assert_allclose(np.asarray(outs[True][1]),
                               np.asarray(outs[False][1]), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[True][2]),
                               np.asarray(outs[False][2]), rtol=0, atol=1e-6)
    # Params get a looser bar than the losses: the two cfgs compile to
    # different XLA programs whose conv fusions differ by ~1 ulp, and early
    # Adam steps amplify that — update = lr*m/(sqrt(v)+1e-8) with v ~ 0
    # turns any ulp in m into an O(1) relative change of the (tiny) update.
    # The 4-epoch loss trajectory agreeing to 1e-6 is the real equivalence.
    for l1, l2 in zip(jax.tree_util.tree_leaves(outs[True][0][0]),
                      jax.tree_util.tree_leaves(outs[False][0][0])):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=0, atol=1e-3)

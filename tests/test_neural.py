"""U-Net / GAN per-clip training loops: shape contracts + learning gates.

CPU-sized problems (small spectrograms, few epochs); full budgets run on TPU
in the pipelines/bench.
"""

import numpy as np
import jax
import jax.numpy as jnp

from audio_inpainting_tpu.models import SimpleUNet, GeneratorUNet, Discriminator
from audio_inpainting_tpu.methods.neural import (
    UNetTrainConfig, unet_train_restore, GANTrainConfig, gan_train_restore)


def _toy_spec(f=64, t=96, seed=0):
    rng = np.random.RandomState(seed)
    # structured low-rank "spectrogram" in [0, 1]
    a = np.abs(rng.randn(f, 4)); b = np.abs(rng.randn(4, t))
    v = a @ b
    return (v / v.max()).astype(np.float32)


def test_simple_unet_shapes():
    x = jnp.zeros((1, 64, 96, 1))
    m = SimpleUNet()
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    y = m.apply({"params": p}, x)
    assert y.shape == (1, 64, 96, 1)


def test_generator_discriminator_shapes():
    x = jnp.zeros((1, 64, 96, 1))
    g = GeneratorUNet()
    gv = g.init(jax.random.PRNGKey(0), x, True)
    y = g.apply(gv, x, True, mutable=["batch_stats"])[0]
    assert y.shape == (1, 64, 96, 1)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh output
    d = Discriminator()
    dv = d.init(jax.random.PRNGKey(1), x, True)
    z = d.apply(dv, x, True, mutable=["batch_stats"])[0]
    assert z.ndim == 4 and z.shape[-1] == 1  # logits (sigmoid applied in loss)
    assert np.isfinite(np.asarray(z)).all()


def test_unet_inpaints_masked_region():
    v = _toy_spec()
    mask = np.ones_like(v)
    mask[:, 40:56] = 0.0
    cfg = UNetTrainConfig(epochs=300, lr=1e-3, masked_loss=True, scan_chunk=150)
    final, pred, losses = unet_train_restore(v, mask, cfg, key=0)
    final = np.asarray(final)
    # kept region is the input itself (composite)
    np.testing.assert_allclose(final[:, :40], v[:, :40], atol=1e-6)
    # masked region should approach the target well below the trivial zero fill
    err = np.linalg.norm(final[:, 40:56] - v[:, 40:56])
    base = np.linalg.norm(v[:, 40:56])
    assert err < 0.5 * base, (err, base)
    # loss decreased
    assert float(losses[-1]) < float(losses[0])


def test_unet_full_loss_variant_runs():
    v = _toy_spec(seed=1)
    mask = np.ones_like(v)
    mask[:, 30:50] = 0.0
    cfg = UNetTrainConfig(epochs=60, masked_loss=False, scan_chunk=60)
    final, pred, losses = unet_train_restore(v, mask, cfg, key=1)
    assert np.isfinite(np.asarray(final)).all()
    assert float(losses[-1]) < float(losses[0])


def test_gan_trains_and_composites():
    v = _toy_spec(seed=2) * 2.0 - 1.0   # [-1, 1] convention
    mask = np.ones_like(v)
    mask[:, 40:56] = 0.0
    inp = v * mask + (-1.0) * (1 - mask)  # damaged region at the floor
    cfg = GANTrainConfig(epochs=120, scan_chunk=60)
    final, (dl, gl) = gan_train_restore(inp, v, mask, cfg, key=0)
    final = np.asarray(final)
    assert final.shape == v.shape
    assert np.isfinite(final).all()
    # kept region untouched
    np.testing.assert_allclose(final[:, :40], inp[:, :40], atol=1e-6)
    # masked region moved toward the real data vs the -1 floor
    err = np.linalg.norm(final[:, 40:56] - v[:, 40:56])
    base = np.linalg.norm(inp[:, 40:56] - v[:, 40:56])
    assert err < 0.7 * base, (err, base)


def test_gan_ema_readout():
    """ema_decay reads out bias-corrected averaged G weights: the output
    differs from single inference, the kept region stays the input, and a
    tiny decay (EMA window ~1 epoch) reproduces single inference — which
    also pins the bias correction (an init-seeded EMA would fail it)."""
    v = _toy_spec(seed=7) * 2.0 - 1.0
    mask = np.ones_like(v)
    mask[:, 40:56] = 0.0
    inp = v * mask + (-1.0) * (1 - mask)
    out_one, _ = gan_train_restore(
        inp, v, mask, GANTrainConfig(epochs=30, scan_chunk=10), key=0)
    out_ema, _ = gan_train_restore(
        inp, v, mask,
        GANTrainConfig(epochs=30, scan_chunk=10, ema_decay=0.9), key=0)
    out_tiny, _ = gan_train_restore(
        inp, v, mask,
        GANTrainConfig(epochs=30, scan_chunk=10, ema_decay=1e-6), key=0)
    out_one, out_ema, out_tiny = map(np.asarray, (out_one, out_ema, out_tiny))
    np.testing.assert_allclose(out_ema[:, :40], inp[:, :40], atol=1e-6)
    assert not np.allclose(out_ema, out_one)
    np.testing.assert_allclose(out_tiny, out_one, atol=1e-4)


def test_gan_ema_gap_scope_splits_fill_by_column():
    """ema_scope='gap': fully-dark columns take the EMA fill, partially-dark
    columns keep the single-inference fill, kept pixels stay the input."""
    v = _toy_spec(seed=8) * 2.0 - 1.0
    mask = np.ones_like(v)
    mask[:, 40:56] = 0.0      # contiguous all-dark gap
    mask[3:7, 10] = 0.0       # scattered dark pixels (column 10 partial)
    inp = v * mask + (-1.0) * (1 - mask)
    outs = {}
    for name, cfg in [
            ("one", GANTrainConfig(epochs=30, scan_chunk=10)),
            ("full", GANTrainConfig(epochs=30, scan_chunk=10, ema_decay=0.9)),
            ("gap", GANTrainConfig(epochs=30, scan_chunk=10, ema_decay=0.9,
                                   ema_scope="gap"))]:
        o, _ = gan_train_restore(inp, v, mask, cfg, key=0)
        outs[name] = np.asarray(o)
    one, full, gap = outs["one"], outs["full"], outs["gap"]
    np.testing.assert_allclose(gap[:, :10], inp[:, :10], atol=1e-6)
    np.testing.assert_allclose(gap[:, 40:56], full[:, 40:56], atol=1e-6)
    np.testing.assert_allclose(gap[3:7, 10], one[3:7, 10], atol=1e-6)
    assert not np.allclose(gap, one) and not np.allclose(gap, full)


def test_gan_retry_l1_retrains_on_bad_draw():
    """retry_l1 below any reachable hole-L1 forces the one-retry path; the
    retrained (folded-key) result differs from the first draw and is still a
    valid composite (kept region untouched)."""
    v = _toy_spec(seed=4) * 2.0 - 1.0
    mask = np.ones_like(v)
    mask[:, 40:56] = 0.0
    inp = v * mask + (-1.0) * (1 - mask)
    out_retry, _ = gan_train_restore(
        inp, v, mask, GANTrainConfig(epochs=20, scan_chunk=10,
                                     retry_l1=1e-9), key=0)
    out_plain, _ = gan_train_restore(
        inp, v, mask, GANTrainConfig(epochs=20, scan_chunk=10), key=0)
    out_retry = np.asarray(out_retry)
    np.testing.assert_allclose(out_retry[:, :40], inp[:, :40], atol=1e-6)
    assert not np.allclose(out_retry, np.asarray(out_plain))


def test_gan_retry_holeless_mask_is_a_noop():
    """retry_l1 with an all-kept mask (no hole at all — e.g. blind damage
    detection found nothing): nothing to judge, no division by the empty
    hole, output is the input composite."""
    v = _toy_spec(seed=6) * 2.0 - 1.0
    mask = np.ones_like(v)
    out, _ = gan_train_restore(
        v, v, mask, GANTrainConfig(epochs=2, scan_chunk=2, retry_l1=0.04),
        key=0)
    np.testing.assert_allclose(np.asarray(out), v, atol=1e-6)


def test_gan_empty_patchgan_map_contract():
    """Clips below the PatchGAN's receptive floor (~32x32 padded cells)
    train on the L1 term alone: d_loss is exactly 0.0 (empty logits map),
    g_loss is finite, and a warning says so. Pins the round-3 fix — the
    empty map's jnp.mean used to report silent NaN losses while training
    proceeded on the L1 gradients."""
    import pytest

    rng = np.random.RandomState(11)
    v = (rng.rand(8, 32).astype(np.float32)) * 2 - 1
    mask = np.ones_like(v)
    mask[:, 12:20] = 0.0
    inp = v * mask + (-1.0) * (1 - mask)
    with pytest.warns(UserWarning, match="PatchGAN"):
        out, (dl, gl) = gan_train_restore(
            inp, v, mask, GANTrainConfig(epochs=2, scan_chunk=2), key=0)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(np.asarray(dl), 0.0)
    assert np.isfinite(np.asarray(gl)).all()


def test_gan_vmap_d_equivalence():
    """vmap_d batches the D step's two N=1 forwards into one vmapped pass.
    Same math as the sequential reference form: vmap keeps per-input batch
    statistics, and the running-average merge reproduces the sequential
    real-then-fake chaining in closed form (neural.py). One full-path epoch
    must agree to conv-reassociation noise. (A long-trajectory comparison is
    deliberately absent: adversarial training is chaotic, so 1e-5 batching
    noise amplifies arbitrarily — equivalence is a step property.)"""
    v = _toy_spec(seed=9) * 2.0 - 1.0
    mask = np.ones_like(v)
    mask[:, 40:56] = 0.0
    inp = v * mask + (-1.0) * (1 - mask)
    out_seq, (dl_s, gl_s) = gan_train_restore(
        inp, v, mask, GANTrainConfig(epochs=1, scan_chunk=1), key=3)
    out_vm, (dl_v, gl_v) = gan_train_restore(
        inp, v, mask, GANTrainConfig(epochs=1, scan_chunk=1, vmap_d=True),
        key=3)
    np.testing.assert_allclose(np.asarray(out_vm), np.asarray(out_seq),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(dl_v), np.asarray(dl_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gl_v), np.asarray(gl_s), atol=1e-4)


def test_gan_vmap_d_running_stats_merge():
    """The vmap_d running-average merge u_fake + m*(u_real - r0) must equal
    the sequential real-then-fake chaining m^2*r0 + m*(1-m)*s_real +
    (1-m)*s_fake exactly — the one state the 1-epoch output test cannot see
    (the readout never reads D's running stats)."""
    from audio_inpainting_tpu.methods.neural import _d_model

    cfg = GANTrainConfig()
    d_model = _d_model(cfg)
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.randn(1, 64, 96, 1), jnp.float32)
    b = jnp.asarray(rng.randn(1, 64, 96, 1), jnp.float32)
    dv = d_model.init(jax.random.PRNGKey(2), a, True)
    dp, r0 = dv["params"], dv["batch_stats"]

    # sequential chaining (the reference's two netD calls)
    _, u1 = d_model.apply({"params": dp, "batch_stats": r0}, a, True,
                          mutable=["batch_stats"])
    _, u2 = d_model.apply(
        {"params": dp, "batch_stats": u1["batch_stats"]}, b, True,
        mutable=["batch_stats"])
    seq = u2["batch_stats"]

    # vmapped pair + closed-form merge (both updates computed from r0)
    def one(x):
        _, upd = d_model.apply({"params": dp, "batch_stats": r0}, x, True,
                               mutable=["batch_stats"])
        return upd["batch_stats"]

    upds = jax.vmap(one)(jnp.stack([a, b]))
    from audio_inpainting_tpu.models.unet import BN_MOMENTUM
    merged = jax.tree_util.tree_map(
        lambda u, r: u[1] + BN_MOMENTUM * (u[0] - r), upds, r0)

    jax.tree_util.tree_map(
        lambda m, s: np.testing.assert_allclose(
            np.asarray(m), np.asarray(s), atol=1e-6), merged, seq)

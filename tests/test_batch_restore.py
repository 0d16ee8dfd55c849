"""Multi-clip batched U-Net restoration on the 8-device mesh."""

import numpy as np
import jax.numpy as jnp

from audio_inpainting_tpu.methods.neural import UNetTrainConfig
from audio_inpainting_tpu.parallel import make_mesh
from audio_inpainting_tpu.parallel.batch import restore_clips_unet


def test_batch_restore_8_clips_dp_sharded():
    rng = np.random.RandomState(0)
    B, F, T = 8, 32, 64
    a = np.abs(rng.randn(B, 4, 1)) ; b = np.abs(rng.randn(B, 1, T))
    mags = np.einsum("bfo,bot->bft", np.abs(rng.randn(B, F, 4)), np.abs(rng.randn(B, 4, T)))
    mags = (mags / mags.max(axis=(1, 2), keepdims=True)).astype(np.float32)[..., None]
    masks = np.ones_like(mags)
    masks[:, :, 20:30, :] = 0.0

    mesh = make_mesh()
    cfg = UNetTrainConfig(epochs=120, scan_chunk=60)
    out, losses = restore_clips_unet(mags, masks, cfg, mesh=mesh, key=0)
    out = np.asarray(out)
    assert out.shape == mags.shape
    assert np.isfinite(out).all()
    # kept regions equal input, per clip
    np.testing.assert_allclose(out[:, :, :20], mags[:, :, :20], atol=1e-6)
    # masked region closer to target than the zero input, for most clips
    err = np.sqrt((((out - mags)[:, :, 20:30]) ** 2).sum(axis=(1, 2, 3)))
    base = np.sqrt((mags[:, :, 20:30] ** 2).sum(axis=(1, 2, 3)))
    assert (err < 0.7 * base).mean() >= 0.75, (err / base)
    assert losses.shape == (8,)


def test_batch_restore_gan_clips_dp_sharded():
    """Multi-clip GAN serving mode: per-clip G/D pairs, clips over dp."""
    import jax
    from audio_inpainting_tpu.methods.neural import GANTrainConfig
    from audio_inpainting_tpu.parallel import restore_clips_gan

    rng = np.random.RandomState(5)
    G, F, T = 8, 12, 32
    real = (rng.rand(G, F, T).astype(np.float32)) * 2 - 1
    masks = np.ones_like(real)
    masks[:, :, 12:20] = 0.0
    norm = real * masks + (-1.0) * (1 - masks)     # hole reads as silence

    mesh = make_mesh()
    cfg = GANTrainConfig(epochs=6, scan_chunk=4)   # exercises partial chunk
    out, (dl, gl) = restore_clips_gan(norm, real, masks, cfg, mesh=mesh,
                                      key=3)
    out = np.asarray(out)
    assert out.shape == (G, F, T)
    assert np.isfinite(out).all()
    assert dl.shape == (G,) and gl.shape == (G,)
    # kept regions are the input, exactly (composite semantics)
    np.testing.assert_allclose(out[:, :, :12], norm[:, :, :12], atol=1e-6)

    # meshless run matches the dp-sharded run (no cross-chip math exists)
    out1, _ = restore_clips_gan(norm, real, masks, cfg, mesh=None, key=3)
    np.testing.assert_allclose(out, np.asarray(out1), atol=1e-5)


def test_batch_restore_respects_epoch_count():
    """epochs not a multiple of scan_chunk must not overtrain: the chunk
    loop clamps the final chunk (cache shows a 100- and a 20-epoch build)."""
    from audio_inpainting_tpu.parallel import batch as batch_mod

    rng = np.random.RandomState(1)
    mags = rng.rand(1, 8, 32, 1).astype(np.float32)
    masks = np.ones_like(mags)
    masks[:, :, 3:5, :] = 0.0
    batch_mod._chunk_fn.cache_clear()
    cfg = UNetTrainConfig(epochs=120, scan_chunk=100)
    restore_clips_unet(mags, masks, cfg, mesh=None, key=0)
    info = batch_mod._chunk_fn.cache_info()
    assert info.misses == 2, info   # one 100-epoch + one 20-epoch program


def test_gan_batch_valid_ones_matches_default():
    """valid_batch of all-ones == leaving it unset (pure plumbing check)."""
    from audio_inpainting_tpu.methods.neural import GANTrainConfig
    from audio_inpainting_tpu.parallel import restore_clips_gan

    rng = np.random.RandomState(2)
    G, F, T = 1, 8, 32
    real = (rng.rand(G, F, T).astype(np.float32)) * 2 - 1
    masks = np.ones_like(real)
    masks[:, :, 10:16] = 0.0
    norm = real * masks + (-1.0) * (1 - masks)
    cfg = GANTrainConfig(epochs=3, scan_chunk=3)
    a, _ = restore_clips_gan(norm, real, masks, cfg, key=1)
    b, _ = restore_clips_gan(norm, real, masks, cfg, key=1,
                             valid_batch=np.ones_like(real))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_gan_batch_single_clip_matches_gan_train_restore():
    """restore_clips_gan with one conforming clip reproduces the benched
    single-clip gan_train_restore exactly (same per-clip key derivation:
    the batch path folds split(key, G)[i])."""
    import jax
    from audio_inpainting_tpu.methods.neural import (GANTrainConfig,
                                                     gan_train_restore)
    from audio_inpainting_tpu.parallel import restore_clips_gan

    rng = np.random.RandomState(7)
    F, T = 8, 32                         # already %4 / %32: pads are no-ops
    real = (rng.rand(F, T).astype(np.float32)) * 2 - 1
    mask = np.ones_like(real)
    mask[:, 10:18] = 0.0
    norm = real * mask + (-1.0) * (1 - mask)
    cfg = GANTrainConfig(epochs=4, scan_chunk=4)

    key = jax.random.PRNGKey(11)
    out_b, (dl, gl) = restore_clips_gan(norm[None], real[None], mask[None],
                                        cfg, key=key)
    clip_key = jax.random.split(key, 1)[0]
    out_s, _ = gan_train_restore(norm, real, mask, cfg, key=clip_key)
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_s),
                               atol=1e-6)


def test_gan_batch_single_clip_matches_production_readout():
    """The equivalence guarantee extends to the PRODUCTION readout policy
    (gap-scoped EMA): batched == single-clip under the same config."""
    import jax
    from audio_inpainting_tpu.methods.neural import (GANTrainConfig,
                                                     gan_train_restore)
    from audio_inpainting_tpu.parallel import restore_clips_gan

    rng = np.random.RandomState(13)
    F, T = 8, 32
    real = (rng.rand(F, T).astype(np.float32)) * 2 - 1
    mask = np.ones_like(real)
    mask[:, 10:18] = 0.0
    norm = real * mask + (-1.0) * (1 - mask)
    cfg = GANTrainConfig(epochs=4, scan_chunk=4, ema_decay=0.99,
                         ema_scope="gap")

    key = jax.random.PRNGKey(21)
    out_b, _ = restore_clips_gan(norm[None], real[None], mask[None],
                                 cfg, key=key)
    clip_key = jax.random.split(key, 1)[0]
    out_s, _ = gan_train_restore(norm, real, mask, cfg, key=clip_key)
    np.testing.assert_allclose(np.asarray(out_b[0]), np.asarray(out_s),
                               atol=1e-6)


def test_gan_batch_retry_retrains_bad_clips():
    """retry_l1 below any reachable hole-L1 forces the batched one-retry
    pass: outputs and losses change for the retried clips, kept cells stay
    the input."""
    from audio_inpainting_tpu.methods.neural import GANTrainConfig
    from audio_inpainting_tpu.parallel import restore_clips_gan

    rng = np.random.RandomState(17)
    G, F, T = 2, 8, 32
    real = (rng.rand(G, F, T).astype(np.float32)) * 2 - 1
    masks = np.ones_like(real)
    masks[:, :, 12:20] = 0.0
    norm = real * masks + (-1.0) * (1 - masks)
    base = GANTrainConfig(epochs=3, scan_chunk=3)
    out0, (dl0, gl0) = restore_clips_gan(norm, real, masks, base, key=5)
    out1, (dl1, gl1) = restore_clips_gan(
        norm, real, masks,
        GANTrainConfig(epochs=3, scan_chunk=3, retry_l1=1e-6), key=5)
    out0, out1 = np.asarray(out0), np.asarray(out1)
    assert not np.allclose(out0, out1)   # folded-key retrain took effect
    np.testing.assert_allclose(out1[:, :, :12], norm[:, :, :12], atol=1e-6)
    # 8x32 is below the PatchGAN's ~32x32 receptive floor: the adversarial
    # term is exactly 0 by contract (empty logits map), never NaN
    assert np.isfinite(np.asarray(dl1)).all() and np.isfinite(
        np.asarray(gl1)).all()
    np.testing.assert_array_equal(np.asarray(dl1), 0.0)


def test_gan_batch_n_real_padding_never_gates_retry():
    """Batch-padding duplicates (clips past n_real) must not trigger the
    retry pass: with every real clip excluded from the check via n_real=0,
    a retry_l1 that would otherwise force a retrain produces the identical
    output to retry_l1=0 (no second pass ran)."""
    from audio_inpainting_tpu.methods.neural import GANTrainConfig
    from audio_inpainting_tpu.parallel import restore_clips_gan

    rng = np.random.RandomState(23)
    G, F, T = 2, 8, 32
    real = (rng.rand(G, F, T).astype(np.float32)) * 2 - 1
    masks = np.ones_like(real)
    masks[:, :, 12:20] = 0.0
    norm = real * masks + (-1.0) * (1 - masks)
    out_plain, _ = restore_clips_gan(
        norm, real, masks, GANTrainConfig(epochs=3, scan_chunk=3), key=5)
    out_gated, _ = restore_clips_gan(
        norm, real, masks,
        GANTrainConfig(epochs=3, scan_chunk=3, retry_l1=1e-6), key=5,
        n_real=0)
    np.testing.assert_array_equal(np.asarray(out_plain),
                                  np.asarray(out_gated))


def test_unet_batch_single_clip_matches_unet_train_restore():
    """restore_clips_unet with one conforming clip reproduces the benched
    single-clip unet_train_restore (same packed trainer core, same keys)."""
    import jax
    from audio_inpainting_tpu.methods.neural import unet_train_restore

    rng = np.random.RandomState(9)
    F, T = 8, 32                         # %4 / %32: single-clip pads no-op
    mag = rng.rand(F, T).astype(np.float32)
    mask = np.ones_like(mag)
    mask[:, 12:20] = 0.0
    cfg = UNetTrainConfig(epochs=5, scan_chunk=5)

    key = jax.random.PRNGKey(4)
    out_b, _ = restore_clips_unet(mag[None, ..., None],
                                  mask[None, ..., None], cfg, key=key)
    clip_key = jax.random.split(key, 1)[0]
    final, _, _ = unet_train_restore(mag, mask, cfg, key=clip_key)
    np.testing.assert_allclose(np.asarray(out_b[0, :, :, 0]),
                               np.asarray(final), atol=1e-6)


def test_unet_batch_composite_mask_differs_from_train_mask():
    """Serving scheme: train on synthetic holes, composite over real ones —
    the composite keeps the input exactly where composite_mask == 1."""
    rng = np.random.RandomState(12)
    mag = rng.rand(1, 8, 32, 1).astype(np.float32)
    train_mask = np.ones_like(mag)
    train_mask[:, :, 5:9, :] = 0.0       # synthetic training holes
    comp_mask = np.ones_like(mag)
    comp_mask[:, :, 20:26, :] = 0.0      # the real damage
    cfg = UNetTrainConfig(epochs=4, scan_chunk=4)
    out, _ = restore_clips_unet(mag, train_mask, cfg, key=0,
                                composite_mask_batch=comp_mask)
    out = np.asarray(out)
    keep = comp_mask[0, :, :, 0] == 1
    np.testing.assert_allclose(out[0, :, :, 0][keep],
                               mag[0, :, :, 0][keep], atol=1e-6)
    assert np.isfinite(out).all()


def test_unet_batch_internal_divisor_padding():
    """Arbitrary (F, T) — padded to the F%4/T%32 divisors internally and
    trimmed on return, like the single-clip path and the GAN twin (the
    serving throughput tool passes the raw 513x1723 part-1 spectrogram)."""
    rng = np.random.RandomState(3)
    mag = rng.rand(1, 13, 37, 1).astype(np.float32)
    mask = np.ones_like(mag)
    mask[:, :, 10:14, :] = 0.0
    cfg = UNetTrainConfig(epochs=4, scan_chunk=4)
    out, losses = restore_clips_unet(mag, mask, cfg, key=0)
    out = np.asarray(out)
    assert out.shape == mag.shape
    assert np.isfinite(out).all()
    # kept cells are the input exactly (composite), at the ORIGINAL extent
    keep = mask[0, :, :, 0] == 1
    np.testing.assert_allclose(out[0, :, :, 0][keep], mag[0, :, :, 0][keep],
                               atol=1e-6)
    assert np.isfinite(np.asarray(losses)).all()

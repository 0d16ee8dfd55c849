"""Diffusion codec pinned against the reference's torch math + tiny
train/sample smoke (CPU budget; full budget runs on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_inpainting_tpu.methods.diffusion import (
    wav_to_logspec, logspec_to_image, image_to_linear_spec, mask_from_image,
    DiffusionConfig, diffusion_inpaint_image)


def test_wav_to_logspec_matches_torch_math():
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(22050).astype(np.float32) * 0.3
    got = np.asarray(wav_to_logspec(jnp.asarray(x)))

    win = torch.hann_window(2048)
    z = torch.stft(torch.tensor(x), 2048, hop_length=512, window=win,
                   return_complex=True)
    spec = z.abs() ** 2
    ls = 20.0 * torch.log10(torch.clamp(spec, min=1e-5)) - 20.0
    expected = torch.clamp(ls, min=-100).numpy()
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=1e-2)


def test_image_codec_roundtrip():
    rng = np.random.RandomState(1)
    logspec = (rng.rand(129, 200).astype(np.float32) * 80.0) - 100.0
    img, smin, smax = logspec_to_image(logspec)
    assert img.dtype == np.uint8 and img.shape == logspec.shape
    linear = image_to_linear_spec(img, smin, smax)
    # roundtrip through uint8: log-domain error bounded by quantization step
    back_log = 20 * np.log10(linear) - 20
    np.testing.assert_allclose(back_log, logspec, atol=(smax - smin) / 255 + 1e-3)


def test_mask_from_image():
    img = np.array([[0, 5, 9], [10, 128, 255]], dtype=np.uint8)
    m = mask_from_image(img)
    np.testing.assert_array_equal(m, [[255, 255, 255], [0, 0, 0]])


def test_diffusion_inpaint_smoke_tiny():
    # tiny budget: verifies the train loop + RePaint sampler wire up and the
    # known region is preserved verbatim
    rng = np.random.RandomState(2)
    img = (rng.rand(48, 64) * 200 + 30).astype(np.uint8)  # no natural blacks
    mask = np.zeros((48, 64), np.uint8)
    mask[:, 24:40] = 255
    img_damaged = img.copy()
    img_damaged[:, 24:40] = 0
    cfg = DiffusionConfig(train_steps=30, batch=2, patch=16, sample_steps=8,
                          base_channels=16, scan_chunk=30)
    out = diffusion_inpaint_image(img_damaged, mask, cfg, key=0)
    assert out.shape == img.shape and out.dtype == np.uint8
    np.testing.assert_array_equal(out[:, :24], img_damaged[:, :24])
    np.testing.assert_array_equal(out[:, 40:], img_damaged[:, 40:])
    assert np.isfinite(out).all()


def test_calibrate_fill_energy():
    """The gap fill is rescaled so its power = ratio x surrounding power."""
    from audio_inpainting_tpu.methods.diffusion import _calibrate_fill_energy

    rng = np.random.default_rng(0)
    n = 8192
    damaged = rng.normal(scale=0.1, size=n).astype(np.float32)
    gs, ge = 2048, 4096
    damaged[gs:ge] = 0.0
    out = rng.normal(scale=1.0, size=n).astype(np.float32)  # 100x hot fill
    mask = np.zeros((64, n // 512), np.uint8)
    mask[:, gs // 512:ge // 512] = 255
    cal = _calibrate_fill_energy(damaged, out, mask, ratio=0.15)
    span = ge - gs
    ctx = np.concatenate([damaged[gs - span:gs], damaged[ge:ge + span]])
    got = np.mean(cal[gs:ge] ** 2) / np.mean(ctx ** 2)
    assert abs(got - 0.15) < 1e-3
    # no damaged columns -> untouched
    none = _calibrate_fill_energy(damaged, out, np.zeros_like(mask), 0.15)
    np.testing.assert_array_equal(none, out)


def test_restore_audio_uses_checkpoint(tmp_path):
    """checkpoint_dir skips per-clip training and restores from the saved
    DDPM params (the pretrained-weights mode)."""
    import jax.numpy as jnp

    from audio_inpainting_tpu.methods.diffusion import (
        DiffusionConfig, diffusion_restore_audio, logspec_to_image,
        train_spectrogram_ddpm, wav_to_logspec)

    rng = np.random.default_rng(1)
    x = rng.normal(scale=0.2, size=16384).astype(np.float32)
    img, _, _ = logspec_to_image(np.asarray(wav_to_logspec(jnp.asarray(x))))
    cfg = DiffusionConfig(train_steps=10, scan_chunk=5, sample_steps=3,
                          patch=16, batch=2, base_channels=8)
    ck = str(tmp_path / "ddpm")
    train_spectrogram_ddpm([img], cfg, key=0, checkpoint_dir=ck)
    d = x.copy()
    d[6000:9000] = 0.0
    out = diffusion_restore_audio(d, 16000, cfg, key=0, checkpoint_dir=ck)
    assert out.shape == d.shape and np.isfinite(out).all()


def test_griffin_lim_short_spectrogram_falls_back():
    """Spectrograms too short for the fused row-space round trip (length
    under n_fft//2+1) must take the generic istft/stft path, not crash."""
    import numpy as np

    from audio_inpainting_tpu.ops.griffin_lim import griffin_lim

    rng = np.random.RandomState(0)
    mag = jnp.asarray(rng.rand(1025, 3).astype("float32"))
    out = griffin_lim(mag, n_iter=2)
    assert out.shape == (1024,)          # (n_frames-1)*hop + ... cropped
    assert bool(jnp.all(jnp.isfinite(out)))


def test_restore_audio_sample_mask_overrides_detection():
    """sample_mask (explicit gaps from the facade): only the named span's
    columns become the hole — a second, naturally-quiet span stays
    untouched in the composite instead of being rewritten."""
    from audio_inpainting_tpu.methods.diffusion import (DiffusionConfig,
                                                        diffusion_restore_audio)

    rng = np.random.default_rng(3)
    x = rng.normal(scale=0.2, size=32768).astype(np.float32)
    x[6000:9000] = 0.0          # the named damage
    x[20000:23000] = 0.0        # quiet but NOT named -> must survive
    m = np.ones(len(x), bool)
    m[6000:9000] = False
    cfg = DiffusionConfig(train_steps=10, scan_chunk=5, sample_steps=3,
                          patch=16, batch=2, base_channels=8)
    out = diffusion_restore_audio(x, 16000, cfg, key=0, sample_mask=m)
    assert out.shape == x.shape and np.isfinite(out).all()
    # composite replaces only the named span (plus its crossfade skirt);
    # the unnamed quiet span is bit-identical input
    np.testing.assert_array_equal(out[20000:23000], x[20000:23000])
    assert np.abs(out[6200:8800]).max() > 0.0

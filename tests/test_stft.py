"""STFT/iSTFT oracles: pin both reference conventions.

scipy convention (512/384 and 1024/256 — reference main4_NMF.py:69,
main4_NMF_gap.py:45-47) against scipy.signal.stft/istft; torch convention
(1024/256 Hann center — main5_UNet_mask.py:77-98) against torch.stft/istft.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audio_inpainting_tpu.ops import (
    scipy_stft_config,
    torch_stft_config,
    stft,
    istft,
)
from audio_inpainting_tpu.ops.stft import magphase, polar
from audio_inpainting_tpu.ops.griffin_lim import griffin_lim


@pytest.mark.parametrize("nperseg,noverlap", [(512, 384), (1024, 768)])
def test_stft_matches_scipy(short_clip, nperseg, noverlap):
    from scipy import signal as sps

    sr, x = short_clip
    _, _, z_ref = sps.stft(x, sr, nperseg=nperseg, noverlap=noverlap)
    cfg = scipy_stft_config(nperseg, noverlap)
    z = np.asarray(stft(jnp.asarray(x), cfg))
    assert z.shape == z_ref.shape
    np.testing.assert_allclose(z, z_ref, atol=2e-6)


@pytest.mark.parametrize("nperseg,noverlap", [(512, 384), (1024, 768)])
def test_istft_roundtrip_matches_scipy(ref_clip, nperseg, noverlap):
    from scipy import signal as sps

    sr, x = ref_clip
    x = x[: 44100 // 2]
    _, _, z_ref = sps.stft(x, sr, nperseg=nperseg, noverlap=noverlap)
    _, x_ref = sps.istft(z_ref, sr, nperseg=nperseg, noverlap=noverlap)

    cfg = scipy_stft_config(nperseg, noverlap)
    z = stft(jnp.asarray(x), cfg)
    x_hat = np.asarray(istft(z, cfg, len(x)))
    # our istft vs scipy's istft of the same spectrum
    np.testing.assert_allclose(x_hat, x_ref[: len(x)], atol=2e-5)
    # and true round-trip fidelity
    np.testing.assert_allclose(x_hat, x, atol=2e-5)


def test_stft_matches_torch(short_clip):
    import torch

    sr, x = short_clip
    n_fft, hop = 1024, 256
    win = torch.hann_window(n_fft)
    z_ref = torch.stft(torch.tensor(x), n_fft, hop_length=hop, window=win,
                       return_complex=True).numpy()
    cfg = torch_stft_config(n_fft, hop)
    z = np.asarray(stft(jnp.asarray(x), cfg))
    assert z.shape == z_ref.shape
    np.testing.assert_allclose(z, z_ref, atol=2e-4)


def test_istft_matches_torch_with_length(ref_clip):
    import torch

    sr, x = ref_clip
    x = x[: 44100 // 2]
    n_fft, hop = 1024, 256
    win = torch.hann_window(n_fft)
    zt = torch.stft(torch.tensor(x), n_fft, hop_length=hop, window=win,
                    return_complex=True)
    x_ref = torch.istft(zt, n_fft, hop_length=hop, window=win, length=len(x)).numpy()

    cfg = torch_stft_config(n_fft, hop)
    z = stft(jnp.asarray(x), cfg)
    x_hat = np.asarray(istft(z, cfg, len(x)))
    np.testing.assert_allclose(x_hat, x_ref, atol=2e-5)
    np.testing.assert_allclose(x_hat, x, atol=2e-5)


def test_magphase_polar_roundtrip(short_clip):
    _, x = short_clip
    cfg = torch_stft_config(1024, 256)
    z = stft(jnp.asarray(x), cfg)
    mag, ph = magphase(z)
    z2 = polar(mag, ph)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=2e-4)


def test_matmul_and_fft_backends_agree(short_clip):
    _, x = short_clip
    a = np.asarray(stft(jnp.asarray(x), torch_stft_config(1024, 256, backend="matmul")))
    b = np.asarray(stft(jnp.asarray(x), torch_stft_config(1024, 256, backend="fft")))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_griffin_lim_reconstructs_sinusoid():
    sr = 22050
    t = np.arange(sr, dtype=np.float32) / sr
    x = (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mag = jnp.abs(stft(jnp.asarray(x), torch_stft_config(2048, 512)))
    y = np.asarray(griffin_lim(mag, n_fft=2048, hop=512, n_iter=32, length=len(x)))
    # phase-blind metric: spectral magnitude error should be small
    my = np.abs(np.asarray(stft(jnp.asarray(y), torch_stft_config(2048, 512))))
    mx = np.asarray(mag)
    rel = np.linalg.norm(my - mx) / np.linalg.norm(mx)
    assert rel < 0.15, rel


def test_griffin_lim_fused_iteration_matches_composition():
    """The row-space fused Griffin-Lim body (ops/griffin_lim.py:_iter_fused)
    is the SAME computation as stft(istft(z)) — identical op order, so the
    match is to f32 round-off — including at the production unaligned length
    (length % hop != 0) and at an exactly hop-aligned length."""
    from audio_inpainting_tpu.ops.griffin_lim import _fused_ok, _iter_fused
    from audio_inpainting_tpu.ops.stft import (hann_window, istft,
                                               overlap_add, stft)

    rng = np.random.RandomState(0)
    for n_fft, hop, length in [(256, 64, 5000), (256, 64, 64 * 78),
                               (128, 32, 3001)]:
        cfg = torch_stft_config(n_fft, hop)
        x = rng.randn(length).astype(np.float32)
        z = stft(jnp.asarray(x), cfg)
        n_frames = z.shape[1]
        assert _fused_ok(cfg, length, n_frames)
        win = hann_window(n_fft)
        den = overlap_add(
            jnp.broadcast_to(win * win, (n_frames, n_fft)), hop, None)
        den_safe = jnp.where(den > 1e-11, den, 1.0)
        got = np.asarray(_iter_fused(z, cfg, length, win, den_safe))
        ref = np.asarray(stft(istft(z, cfg, length), cfg)[:, :n_frames])
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_frame_signal_too_short_raises():
    import pytest

    from audio_inpainting_tpu.ops.stft import frame_signal

    with pytest.raises(ValueError):
        frame_signal(jnp.zeros(1900), 2048, 512)

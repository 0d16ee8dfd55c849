"""Uniform restore() facade: every method through one entry point."""

import numpy as np
import pytest

from audio_inpainting_tpu import restore


@pytest.fixture(scope="module")
def damaged_clip():
    sr = 8000
    t = np.arange(2 * sr) / sr
    x = (0.6 * np.sin(2 * np.pi * 220 * t)
         + 0.25 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
    d = x.copy()
    d[3000:3400] = 0.0
    d[9000:9200] = 0.0
    return sr, x, d


def test_restore_linear(damaged_clip):
    sr, x, d = damaged_clip
    out = restore(d, sr, method="linear")
    assert out.shape == d.shape and np.isfinite(out).all()
    assert np.abs(out[3000:3400]).max() > 0  # filled


def test_restore_ar(damaged_clip):
    sr, x, d = damaged_clip
    out = restore(d, sr, method="ar", seed=0)
    assert out.shape == d.shape and np.isfinite(out).all()
    # better than the zeros in the gap
    err_out = np.abs(out[3000:3400] - x[3000:3400]).mean()
    err_zero = np.abs(x[3000:3400]).mean()
    assert err_out < err_zero


def test_restore_nmf(damaged_clip):
    sr, x, d = damaged_clip
    out = restore(d, sr, method="nmf", n_components=10, n_iter=50)
    assert out.shape == d.shape and np.isfinite(out).all()


def test_restore_gp_short_segment():
    sr = 8000
    t = np.arange(400) / sr
    x = np.sin(2 * np.pi * 300 * t).astype(np.float32)
    d = x.copy()
    d[150:220] = 0.0
    out = restore(d, sr, method="gp", n_restarts=1, opt_steps=20)
    assert out.shape == d.shape and np.isfinite(out).all()


def test_restore_unet(damaged_clip):
    sr, x, d = damaged_clip
    out = restore(d, sr, method="unet", epochs=30, bf16=False)
    assert out.shape == d.shape and np.isfinite(out).all()


def test_restore_unet_blind_fills_with_content():
    """Blind U-Net must train on synthetic stripes over the INTACT columns
    and keep the real holes out of the loss — training against the
    detected-damage mask teaches the net its holes contain silence
    (regression: the fill used to come back at amplitude ~0.003)."""
    sr = 8000
    t = np.arange(3 * sr)
    x = (0.5 * np.sin(2 * np.pi * 440 * t / sr)
         + 0.3 * np.sin(2 * np.pi * 660 * t / sr)).astype(np.float32)
    d = x.copy()
    d[10_000:12_000] = 0.0
    out = restore(d, sr, method="unet", epochs=300, seed=0)
    g = slice(10_000, 12_000)
    assert np.abs(out[g]).max() > 0.1            # real energy, not silence
    # restored energy is the right order of magnitude, not a blown-up fill
    assert 0.2 < np.sqrt(np.mean(out[g] ** 2)) / np.sqrt(np.mean(x[g] ** 2)) < 3.0


def test_restore_explicit_gaps_beat_threshold_scan(damaged_clip):
    """Explicit gaps: only the named spans are rewritten — naturally quiet
    passages the threshold scan would flag stay bit-identical."""
    sr, x, d = damaged_clip
    quiet = d.copy()
    quiet[5000:5600] *= 0.00005          # natural near-silence, NOT damage
    out = restore(quiet, sr, method="linear", gaps=[(3000, 3400)])
    assert np.abs(out[3000:3400]).max() > 0       # the named gap is filled
    np.testing.assert_array_equal(out[5000:5600], quiet[5000:5600])
    np.testing.assert_array_equal(out[9000:9200], quiet[9000:9200])


def test_restore_unet_explicit_gaps_columns(damaged_clip):
    """Spectral methods map explicit gaps through the same hop-window
    silent-fraction criterion as the blind path (only the gap's columns
    train as damage)."""
    sr, x, d = damaged_clip
    out = restore(d, sr, method="unet", gaps=[(3000, 3400)], epochs=20,
                  bf16=False)
    assert out.shape == d.shape and np.isfinite(out).all()


def test_restore_gan_requires_original(damaged_clip):
    """Without ground truth the GAN's target would contain the hole it is
    filling (api.py refuses; reference trains on the clean clip,
    main_gan_gap.py:103-108)."""
    sr, x, d = damaged_clip
    with pytest.raises(ValueError, match="original"):
        restore(d, sr, method="gan", epochs=20)


def test_restore_gan_with_original(damaged_clip):
    sr, x, d = damaged_clip
    out = restore(d, sr, method="gan", epochs=20, original=x)
    assert out.shape == d.shape and np.isfinite(out).all()


def test_restore_unknown_method(damaged_clip):
    sr, x, d = damaged_clip
    with pytest.raises(ValueError):
        restore(d, sr, method="nope")


def test_restore_gan_explicit_gaps_keep_mask(damaged_clip, monkeypatch):
    """The gan branch must honor explicit gaps like every other method:
    keep = the gap columns via the shared hop-window mapping, NOT the
    pixel-brightness scan (which would rewrite naturally dark pixels)."""
    import numpy as np

    from audio_inpainting_tpu.methods import neural

    sr, x, d = damaged_clip
    seen = {}
    real_fn = neural.gan_train_restore

    def spy(input_norm, real, keep, cfg, key=0):
        seen["keep"] = np.asarray(keep)
        return np.asarray(input_norm), (None, None)

    monkeypatch.setattr(neural, "gan_train_restore", spy)
    # 800-sample span: wide enough that at least one hop-window column is
    # >=80% damaged (a 400-sample span can straddle two columns at 78% each
    # and map to none — the reference's own fraction criterion)
    restore(d, sr, method="gan", gaps=[(3000, 3800)], epochs=2, original=x)
    keep = seen["keep"]
    from audio_inpainting_tpu.corrupt import mask_to_bad_columns

    m = np.ones(len(d), bool)
    m[3000:3800] = False
    bad = mask_to_bad_columns(m, keep.shape[1], 256)
    assert bad.any()
    # keep is the column mask: 0 on every gap column, 1 elsewhere —
    # including columns whose pixels are naturally dark
    assert (keep[:, bad] == 0.0).all()
    assert (keep[:, ~bad] == 1.0).all()


def test_restore_unet_all_damaged_is_finite():
    """gaps covering the whole clip: sum(valid) == 0 in the masked loss —
    output must stay finite (degrade), not NaN-poison the composite."""
    sr = 8000
    d = np.zeros(sr, np.float32)
    out = restore(d, sr, method="unet", gaps=[(0, sr)], epochs=2)
    assert np.isfinite(out).all()

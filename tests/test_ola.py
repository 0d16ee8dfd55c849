"""OLA gain equalization (methods/ola_eq.py) against the exact oracle.

The part-1 corruption drops whole STFT columns and resynthesizes via iSTFT,
so damaged = clean * a(t) with a(t) the kept/full squared-window OLA ratio.
These tests verify (1) blind column detection is exact, (2) ola_gain matches
the oracle ratio, (3) equalization recovers the clean signal to within
quantization where a > floor, and (4) the end-to-end part-1 AR stage beats
the damaged baseline globally while improving LSD.
"""

import jax
import jax.numpy as jnp
import numpy as np

from audio_inpainting_tpu.corrupt import random_frame_mask
from audio_inpainting_tpu.methods import ARConfig, ar_restore_gaps
from audio_inpainting_tpu.methods.ola_eq import (
    detect_dropped_frames, equalize_dropped_frames, ola_gain)
from audio_inpainting_tpu.metrics import lsd_db, snr_db
from audio_inpainting_tpu.ops import istft, stft, torch_stft_config
from audio_inpainting_tpu.ops.stft import hann_window, magphase, polar

_CFG = torch_stft_config(1024, 256)


def _damage(x, seed=0, mask_ratio=0.3):
    z = stft(jnp.asarray(x), _CFG)
    mag, phase = magphase(z)
    mask = random_frame_mask(jax.random.PRNGKey(seed), mag.shape[0],
                             mag.shape[1], mask_ratio=mask_ratio)
    damaged = np.asarray(istft(polar(mag * mask, phase), _CFG, len(x)))
    true_dropped = np.asarray(mask)[0] < 0.5
    return damaged, true_dropped, mag.shape[1]


def test_detect_dropped_frames_exact(ref_clip):
    sr, x = ref_clip
    damaged, true_dropped, T = _damage(x)
    det = detect_dropped_frames(damaged, T)
    # no false negatives; false positives only where the clip is truly quiet
    assert not np.any(true_dropped & ~det)
    fp = det & ~true_dropped
    assert fp.sum() <= 3, fp.sum()


def test_ola_gain_matches_oracle(ref_clip):
    sr, x = ref_clip
    n = len(x)
    damaged, true_dropped, T = _damage(x)
    a = np.asarray(ola_gain(jnp.asarray(true_dropped), n))
    # oracle: damaged / x wherever both are well-conditioned
    sel = (np.abs(x) > 1e-2) & (a > 0.05) & (a < 0.95)
    assert sel.sum() > 1000
    ratio = damaged[sel] / x[sel]
    assert np.median(np.abs(ratio - a[sel])) < 1e-3


def test_ola_gain_all_kept_is_one(ref_clip):
    a = np.asarray(ola_gain(jnp.zeros(100, jnp.float32), 25600))
    # interior samples (away from the centered-iSTFT boundary) have full gain
    assert np.allclose(a[512:-512], 1.0, atol=1e-6)


def test_equalize_recovers_shoulders(ref_clip):
    sr, x = ref_clip
    damaged, _, T = _damage(x)
    eq, gaps, a = equalize_dropped_frames(damaged, T)
    sel = a > 0.05
    # equalized region matches the clean signal closely; raw damaged doesn't
    err_eq = float(np.mean((eq[sel] - x[sel]) ** 2))
    err_raw = float(np.mean((damaged[sel] - x[sel]) ** 2))
    assert err_eq < err_raw * 0.2, (err_eq, err_raw)
    assert len(gaps) >= 1
    for s, e in gaps:
        assert np.all(a[s:e] <= 0.05)


def test_part1_ar_stage_beats_damaged(ref_clip):
    sr, x = ref_clip
    damaged, _, T = _damage(x)
    eq, gaps, _ = equalize_dropped_frames(damaged, T)
    ar = np.asarray(ar_restore_gaps(
        jnp.asarray(eq), gaps,
        ARConfig(order=30, alpha=0.5, texture=True, texture_scale=0.1,
                 context_len=1000, passes=2),
        key=jax.random.PRNGKey(1)))
    ar = np.clip(ar, -1.0, 1.0)
    assert snr_db(x, ar) > snr_db(x, damaged)
    assert lsd_db(x, ar) < lsd_db(x, damaged)

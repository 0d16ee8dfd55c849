"""Mask generators (seeded, distribution-matched) and blind detectors."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_inpainting_tpu.corrupt import (
    random_dropout_mask,
    contiguous_gap_mask,
    center_gap_bounds,
    random_frame_mask,
    frame_gap_mask_2d,
    find_main_gap,
    find_gaps,
    silent_frame_columns,
)


def test_random_dropout_mask_properties():
    key = jax.random.PRNGKey(0)
    n = 441000
    mask = np.asarray(random_dropout_mask(key, n, mask_ratio=0.25, max_gap_len=400))
    assert mask.shape == (n,)
    lost_frac = 1 - mask.mean()
    # expected lost fraction ~ ratio * E[len]/max_len = 0.25 * (225/400) ~ 0.14
    # minus overlaps; accept a broad but meaningful band
    assert 0.05 < lost_frac < 0.30, lost_frac
    # deterministic under the same key
    mask2 = np.asarray(random_dropout_mask(key, n, mask_ratio=0.25, max_gap_len=400))
    np.testing.assert_array_equal(mask, mask2)


def test_contiguous_gap_mask():
    mask, (s, e) = contiguous_gap_mask(2205, gap_ratio=0.2)
    assert s == int(2205 * 0.4) and e - s == int(2205 * 0.2)
    assert not mask[s:e].any() and mask[:s].all() and mask[e:].all()


def test_center_gap_bounds():
    s, e = center_gap_bounds(441000, 44100)
    assert (s, e) == (441000 // 2 - 44100, 441000 // 2 + 44100)


def test_random_frame_mask():
    key = jax.random.PRNGKey(7)
    m = np.asarray(random_frame_mask(key, 513, 1723))
    assert m.shape == (513, 1723)
    assert set(np.unique(m)) <= {0.0, 1.0}
    # full-band vertical stripes: every row identical
    assert (m == m[0]).all()
    assert 0.05 < 1 - m[0].mean() < 0.5


def test_frame_gap_mask_2d():
    m = np.asarray(frame_gap_mask_2d(513, 1000))
    assert (m[:, 400:600] == 0).all()
    assert (m[:, :400] == 1).all() and (m[:, 600:] == 1).all()


def test_find_main_gap():
    x = np.ones(10000, dtype=np.float32) * 0.5
    x[3000:5000] = 0.0
    assert find_main_gap(x) == (3000, 5000)
    assert find_main_gap(np.ones(100, dtype=np.float32)) is None


def test_find_main_gap_reference_span_semantics(ref_clip):
    """Pin the reference detector's first-to-last-silent-sample semantics
    (main3_AR_text_gap.py:34-49): it spans ALL sub-threshold samples, so

    - two separated silent runs are reported as ONE gap spanning both, and
    - on int16-quantized real music, natural near-zero crossings make the
      span vastly exceed the actual corruption (why pipelines/part2.py uses
      longest-run detection instead).
    """
    # (a) two runs -> one span from first to last silent sample
    x = np.ones(10000, dtype=np.float32) * 0.5
    x[1000:1500] = 0.0
    x[8000:8200] = 0.0
    assert find_main_gap(x) == (1000, 8200)

    # (b) int16-quantized music: zero crossings quantize to 0 -> the span
    # covers nearly the whole clip even though the real gap is 2 s
    sr, clip = ref_clip
    q = (np.clip(clip, -1, 1) * 32767).astype(np.int16).astype(np.float32) / 32767
    gs, ge = len(q) // 2 - sr, len(q) // 2 + sr
    q[gs:ge] = 0.0
    s, e = find_main_gap(q, threshold=1e-4)
    assert (e - s) > 2 * (ge - gs)  # span >> the actual 2 s gap


def test_find_gaps_run_length():
    x = np.ones(10000, dtype=np.float32) * 0.5
    x[1000:1300] = 0.0   # kept (>100)
    x[2000:2050] = 0.0   # dropped (<=100)
    x[9000:10000] = 0.0  # boundary-touching run, kept
    gaps = find_gaps(x, threshold=0.01, min_len=100)
    assert gaps == [(1000, 1300), (9000, 10000)]


def test_silent_frame_columns_matches_naive():
    rng = np.random.RandomState(5)
    sig = rng.randn(44100).astype(np.float32)
    sig[10000:20000] = 0.0
    hop, n_frames = 256, 44100 // 256
    got = silent_frame_columns(sig, n_frames, hop, threshold=1e-4, silent_fraction=0.9)

    # naive loop from reference main4_NMF_gap.py:28-40
    is_gap = np.abs(sig) < 1e-4
    expected = []
    for c in range(n_frames):
        center = c * hop
        w0, w1 = max(0, center - hop // 2), min(len(sig), center + hop // 2)
        if np.mean(is_gap[w0:w1]) > 0.9:
            expected.append(c)
    np.testing.assert_array_equal(got, np.array(expected))


def test_synth_music_clip_deterministic_and_bounded():
    """Corpus generator (corrupt/synth.py): deterministic per seed,
    peak-normalized, seed-distinct — the material the committed diffusion
    prior trains on (tools/train_diffusion_prior.py)."""
    from audio_inpainting_tpu.corrupt.synth import synth_music_clip

    a = synth_music_clip(5, sr=8000, seconds=1.0)
    b = synth_music_clip(5, sr=8000, seconds=1.0)
    c = synth_music_clip(6, sr=8000, seconds=1.0)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8000,) and a.dtype == np.float32
    assert np.isfinite(a).all()
    assert np.abs(a).max() <= 1.0 + 1e-6
    assert np.abs(a).max() > 0.99          # peak-normalized
    assert not np.array_equal(a, c)        # seeds differ

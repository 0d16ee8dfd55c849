"""Windowed long-clip restoration (methods/windowed.py): planner geometry,
clean-sample passthrough, method dispatch, and O(damage) work."""

import numpy as np
import pytest

from audio_inpainting_tpu.methods.windowed import (_merge_close,
                                                   plan_windows,
                                                   restore_windowed)


def test_merge_close():
    assert _merge_close([], 100) == []
    assert _merge_close([(500, 600), (0, 100)], 100) == [(0, 100), (500, 600)]
    # separated by 50 < 100 -> merged into one span
    assert _merge_close([(0, 100), (150, 300)], 100) == [(0, 300)]
    # containment collapses
    assert _merge_close([(0, 400), (100, 200)], 100) == [(0, 400)]


def test_plan_groups_nearby_gaps_into_one_window():
    n, window, ctx = 1_000_000, 10_000, 1_000
    gaps = [(50_000, 50_500), (52_000, 52_300),  # 2.3k span: one window
            (500_000, 500_800)]                  # far away: its own window
    plan = plan_windows(gaps, n, window, ctx)
    assert len(plan) == 2
    (w0a, sa, ga), (w0b, sb, gb) = plan
    assert sa == sb == window and ga == gaps[:2] and gb == [gaps[2]]
    # every gap sits at least ctx inside its window
    for w0, size, group in plan:
        for s, e in group:
            assert w0 + ctx <= s and e <= w0 + size - ctx


def test_plan_doubles_for_oversized_gap():
    n, window, ctx = 1_000_000, 8_000, 1_000
    plan = plan_windows([(100_000, 120_000)], n, window, ctx)  # 20k gap
    assert len(plan) == 1
    w0, size, _ = plan[0]
    assert size == 32_000  # 8k -> 16k (too small: 20k+2k) -> 32k
    assert w0 + ctx <= 100_000 and 120_000 <= w0 + size - ctx


def test_plan_clamps_to_file_edges():
    plan = plan_windows([(50, 200)], 100_000, 10_000, 1_000)
    assert plan[0][0] == 0  # can't center: clamped to the file start
    plan = plan_windows([(99_000, 99_500)], 100_000, 10_000, 1_000)
    w0, size, _ = plan[0]
    assert w0 == 100_000 - size  # clamped to the end
    # file shorter than the window: w0 = 0, caller pads
    plan = plan_windows([(1_000, 1_200)], 5_000, 10_000, 1_000)
    assert plan[0][:2] == (0, 10_000)


def _long_clip(sr=8000, n=240_000, gaps=((30_000, 30_500),
                                         (150_000, 151_000))):
    # slow 2 Hz carrier + quiet 330 Hz texture: a sub-second gap spans a
    # fraction of the carrier period, so a straight-line fill genuinely
    # beats zeros (same reasoning as test_live_api's 1.5 Hz clip)
    t = np.arange(n)
    x = (0.6 * np.sin(2 * np.pi * 2 * t / sr)
         + 0.2 * np.sin(2 * np.pi * 330 * t / sr)).astype(np.float32)
    dmg = x.copy()
    for s, e in gaps:
        dmg[s:e] = 0.0
    return x, dmg, sr, [tuple(g) for g in gaps]


def test_windowed_linear_passthrough_and_fill():
    clean, dmg, sr, gaps = _long_clip()
    out = restore_windowed(dmg, sr, method="linear", window_s=2.0, margin=50)
    assert out.shape == dmg.shape and out.dtype == np.float32
    # clean audio outside gap +- margin is BIT-identical
    touched = np.zeros(len(dmg), bool)
    for s, e in gaps:
        touched[s - 50:e + 50] = True
    np.testing.assert_array_equal(out[~touched], dmg[~touched])
    # each hole improved vs the damaged zeros
    for s, e in gaps:
        g = slice(s, e)
        assert (np.mean((out[g] - clean[g]) ** 2)
                < np.mean((dmg[g] - clean[g]) ** 2))


def test_windowed_matches_full_restore_inside_gaps():
    """Linear interp sees the same neighbors windowed or not, so the fill
    inside each gap must match the full-clip restore exactly."""
    from audio_inpainting_tpu import api

    clean, dmg, sr, gaps = _long_clip()
    out_w = restore_windowed(dmg, sr, method="linear", window_s=2.0,
                             gaps=gaps)
    mask = np.ones(len(dmg), bool)
    for s, e in gaps:
        mask[s:e] = False
    out_f = np.asarray(api.restore(dmg, sr, method="linear", mask=mask))
    for s, e in gaps:
        np.testing.assert_allclose(out_w[s:e], out_f[s:e], atol=1e-6)


def test_windowed_only_processes_damage(monkeypatch):
    """A 30 s clip with two small gaps must dispatch exactly two window-sized
    restores, never the full clip — that's the O(damage) contract."""
    from audio_inpainting_tpu import api

    calls = []
    real = api.restore

    def spy(damaged, sr, **kw):
        calls.append(len(damaged))
        return real(damaged, sr, **kw)

    monkeypatch.setattr(api, "restore", spy)
    _, dmg, sr, gaps = _long_clip()
    restore_windowed(dmg, sr, method="linear", window_s=2.0)
    assert calls == [2 * sr, 2 * sr]


def test_windowed_foreign_gap_in_context_is_masked(monkeypatch):
    """When another group's gap falls inside this window's CONTEXT, the
    method must see it as damage (gaps+mask) — not fit on its silence —
    while the composite still writes only the owning group's samples."""
    from audio_inpainting_tpu import api

    seen = []
    real = api.restore

    def spy(damaged, sr, **kw):
        seen.append(sorted(kw["gaps"]))
        return real(damaged, sr, **kw)

    monkeypatch.setattr(api, "restore", spy)
    sr = 8000
    # a 5000-sample gap then a small one 1000 samples later: with a 1 s
    # (8000-sample) window and ctx=1000 the pair doesn't fit one group
    # (span 6200 + 2000 > 8000), yet each group's centered window overlaps
    # the other group's gap
    gaps = [(20_000, 25_000), (26_000, 26_200)]
    clean, dmg, sr, _ = _long_clip(n=48_000, gaps=gaps)
    out = restore_windowed(dmg, sr, method="linear", window_s=1.0,
                           gaps=gaps)
    assert len(seen) == 2
    for local in seen:
        assert len(local) == 2  # both gaps visible to the method
    # both holes still composited (each by its own window)
    for s, e in gaps:
        assert np.abs(out[s:e]).max() > 0.01


def test_windowed_short_file_reflect_pad():
    """File shorter than the window: reflect-pad, restore, composite back."""
    clean, dmg, sr, gaps = _long_clip(n=6_000, gaps=((2_000, 2_300),))
    out = restore_windowed(dmg, sr, method="linear", window_s=2.0)
    assert out.shape == dmg.shape
    g = slice(*gaps[0])
    assert (np.mean((out[g] - clean[g]) ** 2)
            < np.mean((dmg[g] - clean[g]) ** 2))


def test_windowed_ar_texture_path():
    """AR (the package default method) through the windowed path."""
    clean, dmg, sr, gaps = _long_clip(gaps=((100_000, 100_400),))
    out = restore_windowed(dmg, sr, method="ar", window_s=1.0, order=16,
                           context_len=800, seed=0)
    g = slice(*gaps[0])
    assert np.abs(out[g]).max() > 0.01
    assert (np.mean((out[g] - clean[g]) ** 2)
            < np.mean((dmg[g] - clean[g]) ** 2))


def test_windowed_unet_batched_equals_sequential():
    """batch_windows=True stacks same-size windows into one dp-mesh program
    (every window keeping the sequential path's key), so the output matches
    the per-window path to the batch-vs-single f32 pin."""
    clean, dmg, sr, gaps = _long_clip(
        n=64_000, gaps=((10_000, 10_400), (40_000, 40_400)))
    kw = dict(method="unet", window_s=0.5, gaps=gaps, epochs=4, seed=3)
    seq = restore_windowed(dmg, sr, batch_windows=False, **kw)
    bat = restore_windowed(dmg, sr, batch_windows=True, **kw)
    # identical plan -> identical clean passthrough; restored spans match
    # to the pinned tolerance of tests/test_batch_restore.py
    np.testing.assert_allclose(bat, seq, atol=2e-5)
    for s, e in gaps:
        assert np.abs(bat[s:e]).max() > 1e-4  # something was written


def test_windowed_unet_batched_on_8dev_mesh():
    """batch_windows over the full virtual 8-device dp mesh: the two real
    windows are padded with repeats to the mesh divisor and the output
    still matches the sequential path."""
    from audio_inpainting_tpu.parallel import make_mesh

    clean, dmg, sr, gaps = _long_clip(
        n=64_000, gaps=((10_000, 10_400), (40_000, 40_400)))
    kw = dict(method="unet", window_s=0.5, gaps=gaps, epochs=4, seed=3)
    seq = restore_windowed(dmg, sr, batch_windows=False, **kw)
    bat = restore_windowed(dmg, sr, batch_windows=True, mesh=make_mesh(),
                           **kw)
    np.testing.assert_allclose(bat, seq, atol=2e-5)


def test_windowed_unet_batched_mixed_sizes():
    """Two size classes (one oversized gap doubles its window): the batched
    path restores each class as its own batch and keeps prepped order."""
    clean, dmg, sr, gaps = _long_clip(
        n=64_000, gaps=((10_000, 10_300), (36_000, 41_000)))
    kw = dict(method="unet", window_s=0.5, gaps=gaps, epochs=4, seed=0)
    seq = restore_windowed(dmg, sr, batch_windows=False, **kw)
    bat = restore_windowed(dmg, sr, batch_windows=True, **kw)
    np.testing.assert_allclose(bat, seq, atol=2e-5)


def test_windowed_ar_batched_equals_sequential():
    """batch_windows=True for AR: same-shape-bucket windows restore as one
    vmapped fused program (methods.ar.ar_restore_gaps_windows), every
    window keeping the sequential path's PRNGKey(seed) — batched ==
    sequential (VERDICT r3 #5)."""
    clean, dmg, sr, gaps = _long_clip(
        n=64_000, gaps=((10_000, 10_400), (40_000, 40_400),
                        (55_000, 55_200)))
    kw = dict(method="ar", window_s=0.5, gaps=gaps, order=16,
              context_len=400, seed=1)
    seq = restore_windowed(dmg, sr, batch_windows=False, **kw)
    bat = restore_windowed(dmg, sr, batch_windows=True, **kw)
    np.testing.assert_allclose(bat, seq, atol=1e-5)
    for s, e in gaps:
        assert np.abs(bat[s:e]).max() > 1e-4


def test_windowed_ar_batched_mixed_buckets():
    """Gaps in different length buckets (one long span doubles the window)
    split into separate classes; output order and values still match the
    sequential path."""
    clean, dmg, sr, gaps = _long_clip(
        n=64_000, gaps=((10_000, 10_300), (36_000, 39_500)))
    kw = dict(method="ar", window_s=0.5, gaps=gaps, order=16,
              context_len=400, seed=0)
    seq = restore_windowed(dmg, sr, batch_windows=False, **kw)
    bat = restore_windowed(dmg, sr, batch_windows=True, **kw)
    np.testing.assert_allclose(bat, seq, atol=1e-5)


def test_ar_bucketing_is_exact_without_texture():
    """Shape bucketing (padded gap batch + pow2 extrapolation length) must
    not change the math: with texture off (no noise draws, whose shapes
    bucketing legitimately changes) bucketed == exact-shape fills."""
    from audio_inpainting_tpu.methods.ar import ARConfig, ar_restore_gaps

    clean, dmg, sr, gaps = _long_clip(n=32_000,
                                      gaps=((9_000, 9_300), (21_000, 21_150)))
    base = dict(order=16, context_len=400, texture=False, passes=1)
    a = np.asarray(ar_restore_gaps(dmg, gaps, ARConfig(**base, bucket=False)))
    b = np.asarray(ar_restore_gaps(dmg, gaps, ARConfig(**base, bucket=True)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_windowed_no_gaps_is_identity():
    x = (0.5 * np.sin(np.arange(10_000) * 0.1)).astype(np.float32)
    out = restore_windowed(x, 8000, method="linear")
    np.testing.assert_array_equal(out, x)


def test_windowed_restore_cli(tmp_path):
    """`restore --window-s` end to end through the CLI."""
    from audio_inpainting_tpu.cli.main import main
    from audio_inpainting_tpu.io import load_mono_normalized, save_wav_int16

    clean, dmg, sr, gaps = _long_clip(n=48_000, gaps=((20_000, 20_400),))
    pin = tmp_path / "in.wav"
    pout = tmp_path / "out.wav"
    save_wav_int16(dmg, sr, str(pin))
    rc = main(["restore", str(pin), str(pout), "--method", "linear",
               "--threshold", "0.01", "--window-s", "1.0"])
    assert rc == 0
    sr2, x = load_mono_normalized(str(pout))
    g = slice(*gaps[0])
    assert sr2 == sr and np.abs(x[g]).max() > 0.01


def test_windowed_gp_on_long_file():
    """GP is refused on long clips by the API but fine windowed: the window
    bounds the O(n^3) fit (the reference's own 0.05 s trick)."""
    clean, dmg, sr, gaps = _long_clip(n=60_000, gaps=((30_000, 30_150),))
    out = restore_windowed(dmg, sr, method="gp", window_s=0.15,
                           opt_steps=0, n_restarts=1)
    g = slice(*gaps[0])
    assert (np.mean((out[g] - clean[g]) ** 2)
            < np.mean((dmg[g] - clean[g]) ** 2))


def test_windowed_out_of_range_gap_clamped():
    """A span poking past the clip end is clamped (api.restore's semantics),
    not silently dropped — same request must not behave differently with
    and without window_s."""
    clean, dmg, sr, _ = _long_clip(n=48_000, gaps=((47_000, 48_000),))
    out = restore_windowed(dmg, sr, method="linear", window_s=1.0,
                           gaps=[(47_000, 48_100)])
    # before the clamp the whole span was dropped and the zeros returned
    # untouched; now the tail is filled (left-anchored, no right neighbor)
    assert np.abs(out[47_000:48_000]).min() > 0.01
    np.testing.assert_array_equal(out[:46_900], dmg[:46_900])


def test_windowed_reflect_pad_mirrors_gap_validity():
    """A tail gap whose reflect-pad mirrors its own zeros: the mirrored
    copies must be marked damaged too, or linear anchors the fill's right
    edge on fake silence and ramps to zero."""
    sr, n = 8000, 6000
    dmg = np.full(n, 0.5, np.float32)
    dmg[5500:] = 0.0                      # tail gap, padded window mirrors it
    out = restore_windowed(dmg, sr, method="linear", window_s=1.0,
                           gaps=[(5500, 6000)])
    # both neighbors of the hole are 0.5 -> fill must stay near 0.5; a
    # mirrored-zero anchor would ramp the tail toward 0
    assert out[5500:6000].min() > 0.4


def test_windowed_fully_damaged_clip_stays_finite():
    """Explicit gaps covering every sample: the U-Net's masked-loss
    denominator is 0 — the output must degrade gracefully, never NaN."""
    sr, n = 8000, 4096
    dmg = np.zeros(n, np.float32)
    out = restore_windowed(dmg, sr, method="unet", window_s=0.5,
                           gaps=[(0, n)], epochs=2)
    assert np.isfinite(out).all()


def test_windowed_max_window_refuses_oversized_plan():
    """max_window binds the PLANNED window (after power-of-two doubling),
    the guard live.py relies on for GP's O(n^3) ceiling."""
    sr = 8000
    clean, dmg, sr, _ = _long_clip(n=480_000, gaps=((100_000, 140_000),))
    with pytest.raises(ValueError, match="window"):
        restore_windowed(dmg, sr, method="gp", window_s=0.5,
                         gaps=[(100_000, 140_000)], max_window=20_000)

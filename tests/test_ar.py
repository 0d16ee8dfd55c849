"""Bidirectional AR: exact parity with a sklearn replication of the
reference loop (texture off, deterministic), plus golden quality gates."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audio_inpainting_tpu.methods import ARConfig, ar_restore_gap, ar_restore_gaps
from audio_inpainting_tpu.metrics import snr_db, local_snr_db


def _reference_ar_restore(signal, gap, order, alpha):
    """Faithful numpy/sklearn replication of main2_AR.py:60-104 (no texture)."""
    from sklearn.linear_model import Ridge

    gs, ge = gap
    gap_len = ge - gs

    def make_dataset(d):
        X = np.stack([d[i : i + order] for i in range(len(d) - order)])
        y = np.array([d[i + order] for i in range(len(d) - order)])
        return X, y

    def train_predict(X, y, steps):
        model = Ridge(alpha=alpha)
        model.fit(X, y)
        cur = X[-1].copy()
        preds = []
        for _ in range(steps):
            p = model.predict(cur.reshape(1, -1))[0]
            preds.append(p)
            cur = np.roll(cur, -1)
            cur[-1] = p
        return np.array(preds)

    Xl, yl = make_dataset(signal[:gs])
    Xr, yr = make_dataset(signal[ge:][::-1])
    fwd = train_predict(Xl, yl, gap_len)
    bwd = train_predict(Xr, yr, gap_len)[::-1]
    w = np.linspace(1, 0, gap_len)
    out = signal.copy()
    out[gs:ge] = fwd * w + bwd * (1 - w)
    return out


def test_ar_matches_sklearn_reference_exactly(short_clip):
    sr, x = short_clip
    n = len(x)
    gs = int(n * 0.4)
    ge = gs + int(n * 0.2)
    order = 30

    expected = _reference_ar_restore(x.astype(np.float64), (gs, ge), order, 0.1)

    cfg = ARConfig(order=order, alpha=0.1, texture=False,
                   context_len=max(gs, n - ge), passes=1)
    corrupted = x.copy()
    corrupted[gs:ge] = 0
    got = np.asarray(ar_restore_gap(jnp.asarray(corrupted), (gs, ge), cfg))

    # context region untouched
    np.testing.assert_allclose(got[:gs], x[:gs], atol=1e-6)
    np.testing.assert_allclose(got[ge:], x[ge:], atol=1e-6)
    # recursive extrapolation compounds f32 round-off; require close agreement
    err = np.max(np.abs(got[gs:ge] - expected[gs:ge]))
    assert err < 5e-3, err
    # and equivalent restoration quality
    snr_ours = float(local_snr_db(x, got, gs, ge))
    snr_ref = float(local_snr_db(x, expected.astype(np.float32), gs, ge))
    assert abs(snr_ours - snr_ref) < 0.1, (snr_ours, snr_ref)


def test_ar_restores_pure_tone_well():
    sr = 8000
    t = np.arange(2000) / sr
    x = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    gs, ge = 900, 1100
    corrupted = x.copy()
    corrupted[gs:ge] = 0
    cfg = ARConfig(order=30, alpha=0.1, texture=False, context_len=900)
    got = np.asarray(ar_restore_gap(jnp.asarray(corrupted), (gs, ge), cfg))
    assert float(local_snr_db(x, got, gs, ge)) > 20.0


def test_ar_multigap_batched():
    rng = np.random.RandomState(3)
    sr = 8000
    t = np.arange(8000) / sr
    x = (np.sin(2 * np.pi * 300 * t) + 0.3 * np.sin(2 * np.pi * 650 * t)).astype(np.float32)
    gaps = [(1000, 1150), (3000, 3300), (6000, 6050)]
    corrupted = x.copy()
    for s, e in gaps:
        corrupted[s:e] = 0
    cfg = ARConfig(order=30, alpha=0.5, texture=True, context_len=1000, passes=2)
    got = np.asarray(ar_restore_gaps(jnp.asarray(corrupted), gaps,
                                     cfg, key=jax.random.PRNGKey(0)))
    for s, e in gaps:
        assert float(local_snr_db(x, got, s, e)) > 5.0, (s, e)
    # untouched outside gaps
    mask = np.ones_like(x, bool)
    for s, e in gaps:
        mask[s:e] = False
    np.testing.assert_allclose(got[mask], x[mask], atol=1e-6)


def test_ar_texture_deterministic_under_key():
    rng = np.random.RandomState(4)
    x = rng.randn(3000).astype(np.float32)
    gaps = [(1000, 1200)]
    cfg = ARConfig(order=20, alpha=0.5, texture=True, context_len=800)
    a = np.asarray(ar_restore_gaps(jnp.asarray(x), gaps, cfg, key=jax.random.PRNGKey(7)))
    b = np.asarray(ar_restore_gaps(jnp.asarray(x), gaps, cfg, key=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(ar_restore_gaps(jnp.asarray(x), gaps, cfg, key=jax.random.PRNGKey(8)))
    assert not np.allclose(c[1000:1200], a[1000:1200])


def test_ar_gap_at_boundary_falls_back_one_sided():
    x = np.sin(np.arange(3000) * 0.2).astype(np.float32)
    # gap at the very start: no left context -> backward-only
    gaps = [(0, 100)]
    cfg = ARConfig(order=20, alpha=0.1, texture=False, context_len=500)
    got = np.asarray(ar_restore_gaps(jnp.asarray(x), gaps, cfg))
    assert np.all(np.isfinite(got))
    assert float(local_snr_db(np.sin(np.arange(3000) * 0.2).astype(np.float32), got, 0, 100)) > 10


def test_chunked_extrapolation_matches_scan_deterministic():
    """Companion-matrix chunked mode == per-sample scan (texture off).

    Same fit, same start state; only the evaluation order of the identical
    recurrence algebra differs, so outputs match to f32 reassociation
    tolerance over a multi-chunk horizon."""
    from audio_inpainting_tpu.methods.ar import (_extract_contexts,
                                                 _extrapolate_chunked,
                                                 _extrapolate_scan,
                                                 _fit_ridge_batched)

    rng = np.random.RandomState(11)
    # stable-ish textured signal: damped oscillator + noise
    t = np.arange(6000)
    x = (np.sin(t * 0.11) + 0.4 * np.sin(t * 0.037) +
         0.05 * rng.randn(6000)).astype(np.float32)
    cfg = ARConfig(order=24, alpha=0.5, texture=False, context_len=1500,
                   chunk=64)
    starts = jnp.asarray(np.array([2500], np.int32))
    ends = jnp.asarray(np.array([2800], np.int32))
    ctxs, pads = _extract_contexts(jnp.asarray(x), starts, ends,
                                   cfg.context_len)
    w, b, std, valid = _fit_ridge_batched(ctxs, pads, cfg)
    key = jax.random.PRNGKey(0)
    steps = 300   # 300 = 4.7 chunks of 64: exercises padding + trim
    seq = np.asarray(_extrapolate_scan(ctxs, w, b, std, valid, key, steps,
                                       False))
    chk = np.asarray(_extrapolate_chunked(ctxs, w, b, std, valid, key,
                                          steps, False, cfg.chunk))
    np.testing.assert_allclose(chk, seq, atol=2e-3, rtol=0)


def test_chunked_extrapolation_matches_scan_texture_same_key():
    """With texture on, the chunked path draws the SAME (steps, B) noise
    tensor from the same key, so per-sample noise injection matches the
    sequential path too."""
    from audio_inpainting_tpu.methods.ar import (_extract_contexts,
                                                 _extrapolate_chunked,
                                                 _extrapolate_scan,
                                                 _fit_ridge_batched)

    rng = np.random.RandomState(12)
    t = np.arange(6000)
    x = (np.sin(t * 0.09) + 0.05 * rng.randn(6000)).astype(np.float32)
    cfg = ARConfig(order=20, alpha=0.5, texture=True, context_len=1200,
                   chunk=32)
    starts = jnp.asarray(np.array([2500], np.int32))
    ends = jnp.asarray(np.array([2650], np.int32))
    ctxs, pads = _extract_contexts(jnp.asarray(x), starts, ends,
                                   cfg.context_len)
    w, b, std, valid = _fit_ridge_batched(ctxs, pads, cfg)
    key = jax.random.PRNGKey(3)
    steps = 150
    seq = np.asarray(_extrapolate_scan(ctxs, w, b, std, valid, key, steps,
                                       True))
    chk = np.asarray(_extrapolate_chunked(ctxs, w, b, std, valid, key,
                                          steps, True, cfg.chunk))
    np.testing.assert_allclose(chk, seq, atol=2e-3, rtol=0)


def test_chunked_restore_end_to_end_quality():
    """ARConfig(chunk=128) through the public API restores as well as the
    default path and leaves non-gap samples untouched."""
    rng = np.random.RandomState(13)
    t = np.arange(9000)
    x = (np.sin(t * 0.13) + 0.3 * np.sin(t * 0.041)).astype(np.float32)
    gaps = [(4000, 4500)]
    base = ARConfig(order=30, alpha=0.1, texture=False, context_len=2000)
    fast = ARConfig(order=30, alpha=0.1, texture=False, context_len=2000,
                    chunk=128)
    got_b = np.asarray(ar_restore_gaps(jnp.asarray(x), gaps, base))
    got_f = np.asarray(ar_restore_gaps(jnp.asarray(x), gaps, fast))
    snr_b = float(local_snr_db(x, got_b, 4000, 4500))
    snr_f = float(local_snr_db(x, got_f, 4000, 4500))
    assert snr_f > 10.0, snr_f
    assert abs(snr_f - snr_b) < 1.0, (snr_f, snr_b)
    mask = np.ones_like(x, bool)
    mask[4000:4500] = False
    np.testing.assert_allclose(got_f[mask], x[mask], atol=1e-6)


def test_chunk_smaller_than_order_raises():
    x = np.sin(np.arange(4000) * 0.1).astype(np.float32)
    cfg = ARConfig(order=100, texture=False, context_len=1000, chunk=64)
    with pytest.raises(ValueError):
        ar_restore_gap(jnp.asarray(x), (1500, 1700), cfg)


def test_chunked_multigap_matches_scan():
    """Chunked engine over a BATCH of gaps (2 gaps x 2 directions = B=4)
    matches the sequential scan engine through the public multi-gap API."""
    rng = np.random.RandomState(21)
    t = np.arange(12000)
    x = (np.sin(t * 0.12) + 0.3 * np.sin(t * 0.05)
         + 0.02 * rng.randn(12000)).astype(np.float32)
    gaps = [(3000, 3300), (8000, 8500)]
    base = ARConfig(order=24, alpha=0.2, texture=True, context_len=1500)
    fast = ARConfig(order=24, alpha=0.2, texture=True, context_len=1500,
                    chunk=64)
    a = np.asarray(ar_restore_gaps(jnp.asarray(x), gaps, base,
                                   key=jax.random.PRNGKey(9)))
    b = np.asarray(ar_restore_gaps(jnp.asarray(x), gaps, fast,
                                   key=jax.random.PRNGKey(9)))
    np.testing.assert_allclose(b, a, atol=5e-3)
    for s, e in gaps:
        assert float(local_snr_db(x, b, s, e)) > 3.0

"""Streaming restorer (methods/streaming.py): passthrough, chunk-size
invariance, bounded latency, and parity with the offline windowed engine."""

import numpy as np
import pytest

from audio_inpainting_tpu.methods.streaming import (StreamRestorer,
                                                    restore_stream)
from audio_inpainting_tpu.methods.windowed import restore_windowed


def _clip(sr=8000, n=120_000, gaps=((30_000, 30_400), (80_000, 80_600))):
    t = np.arange(n)
    x = (0.6 * np.sin(2 * np.pi * 2 * t / sr)
         + 0.2 * np.sin(2 * np.pi * 330 * t / sr)).astype(np.float32)
    dmg = x.copy()
    for s, e in gaps:
        dmg[s:e] = 0.0
    return x, dmg, sr, [tuple(g) for g in gaps]


def _run(dmg, sr, chunk, **kw):
    rest = StreamRestorer(sr, **kw)
    parts = [rest.feed(dmg[i:i + chunk]) for i in range(0, len(dmg), chunk)]
    parts.append(rest.flush())
    return np.concatenate(parts)


def test_stream_clean_passthrough_bit_identical():
    x, _, sr, _ = _clip(gaps=())
    out = _run(x, sr, 7_777, method="linear", window_s=1.0)
    np.testing.assert_array_equal(out, x)


def test_stream_restores_gaps_and_preserves_clean():
    clean, dmg, sr, gaps = _clip()
    out = _run(dmg, sr, 16_000, method="linear", window_s=1.0, margin=50)
    assert out.shape == dmg.shape
    touched = np.zeros(len(dmg), bool)
    for s, e in gaps:
        touched[s - 50:e + 50] = True
    np.testing.assert_array_equal(out[~touched], dmg[~touched])
    for s, e in gaps:
        g = slice(s, e)
        assert (np.mean((out[g] - clean[g]) ** 2)
                < np.mean((dmg[g] - clean[g]) ** 2))


def test_stream_chunk_size_invariance():
    """The emitted bytes must not depend on how the stream was chunked —
    windows are planned in absolute coordinates and only restored once
    their placement can never change."""
    _, dmg, sr, _ = _clip(n=60_000, gaps=((20_000, 20_400),))
    outs = [_run(dmg, sr, c, method="linear", window_s=1.0)
            for c in (1_000, 7_777, 60_000)]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_stream_matches_offline_windowed_fill():
    """A gap far from both stream ends gets the same absolute window the
    offline engine plans, so the fill is identical (linear: exact)."""
    clean, dmg, sr, gaps = _clip(n=120_000, gaps=((60_000, 60_400),))
    out_s = _run(dmg, sr, 10_000, method="linear", window_s=1.0, margin=50)
    out_w = restore_windowed(dmg, sr, method="linear", window_s=1.0,
                             margin=50)
    np.testing.assert_allclose(out_s, out_w, atol=1e-7)


def test_stream_bounded_latency_on_clean_audio():
    """Clean audio is held back only margin samples (plus any trailing
    sub-threshold run): the stream never buffers without bound."""
    x, _, sr, _ = _clip(n=64_000, gaps=())
    rest = StreamRestorer(sr, method="linear", window_s=1.0, margin=50)
    emitted = 0
    for i in range(0, len(x), 8_000):
        emitted += len(rest.feed(x[i:i + 8_000]))
        assert rest.pending <= 50 + 1 + 256  # margin + slack for quiet tail
    emitted += len(rest.flush())
    assert emitted == len(x)


def test_stream_gap_held_until_context_then_emitted():
    """A gap is held while its window's right context is missing, restored
    and emitted once enough arrives."""
    clean, dmg, sr, gaps = _clip(n=48_000, gaps=((24_000, 24_400),))
    rest = StreamRestorer(sr, method="linear", window_s=1.0, margin=50)
    out1 = rest.feed(dmg[:25_000])     # gap just arrived: must be held
    assert len(out1) < 24_000 - 50 + 1
    out2 = rest.feed(dmg[25_000:])
    out3 = rest.flush()
    out = np.concatenate([out1, out2, out3])
    g = slice(*gaps[0])
    assert (np.mean((out[g] - clean[g]) ** 2)
            < np.mean((dmg[g] - clean[g]) ** 2))


def test_stream_tail_gap_restored_at_flush():
    clean, dmg, sr, gaps = _clip(n=40_000, gaps=((39_000, 40_000),))
    out = _run(dmg, sr, 6_000, method="linear", window_s=1.0)
    assert len(out) == len(dmg)
    assert np.abs(out[39_000:]).min() > 0.0  # filled, not silence


def test_stream_monster_gap_tiled_bounded_memory():
    """Damage far beyond the window cap is restored in fixed tiles and the
    buffer never grows past O(cap + pending): an unbounded dropout cannot
    OOM the stream."""
    sr = 8000
    n = 200_000
    t = np.arange(n)
    x = (0.5 * np.sin(2 * np.pi * 3 * t / sr)).astype(np.float32)
    dmg = x.copy()
    dmg[40_000:160_000] = 0.0          # 120k-sample hole, cap = 8k*2^3? no:
    rest = StreamRestorer(sr, method="linear", window_s=0.5,
                          max_doublings=2, margin=50)
    held = []
    out_parts = []
    for i in range(0, n, 8_000):
        out_parts.append(rest.feed(dmg[i:i + 8_000]))
        held.append(len(rest._buf))
    out_parts.append(rest.flush())
    out = np.concatenate(out_parts)
    assert len(out) == n
    # buffer stayed bounded even while the 120k hole streamed through
    cap = rest.cap
    assert max(held) < 4 * cap + 16_000
    # the hole was written (tiled fills), clean audio preserved. The blind
    # detector opens the span at 39_992 (the 3 Hz sine is sub-threshold for
    # ~8 samples before its zero crossing at 40_000), so the margin ramp
    # starts at 39_942 — bit-identity holds strictly before that.
    np.testing.assert_array_equal(out[:39_942], dmg[:39_942])
    assert np.isfinite(out).all()


def test_restore_stream_generator():
    clean, dmg, sr, gaps = _clip(n=40_000, gaps=((20_000, 20_300),))
    chunks = [dmg[i:i + 9_000] for i in range(0, len(dmg), 9_000)]
    out = np.concatenate(list(restore_stream(chunks, sr, method="linear",
                                             window_s=1.0)))
    assert out.shape == dmg.shape
    g = slice(*gaps[0])
    assert (np.mean((out[g] - clean[g]) ** 2)
            < np.mean((dmg[g] - clean[g]) ** 2))


def test_stream_feed_after_flush_raises():
    rest = StreamRestorer(8000, method="linear")
    rest.flush()
    with pytest.raises(RuntimeError):
        rest.feed(np.zeros(10, np.float32))


def test_stream_warmup_linear_is_noop():
    rest = StreamRestorer(8000, method="linear")
    assert rest.warmup() == 0


class _CompileCounter(list):
    """Counts XLA compiles via the jax_log_compiles log line."""

    def __enter__(self):
        import logging

        import jax

        self._logger = logging.getLogger("jax._src.interpreters.pxla")

        class H(logging.Handler):
            def emit(h, record):
                if "Compiling" in record.getMessage():
                    self.append(record.getMessage())

        self._handler = H()
        self._prev = jax.config.jax_log_compiles
        jax.config.update("jax_log_compiles", True)
        self._logger.addHandler(self._handler)
        return self

    def __exit__(self, *exc):
        import jax

        self._logger.removeHandler(self._handler)
        jax.config.update("jax_log_compiles", False if not self._prev
                          else self._prev)


def test_stream_warmup_then_feed_compiles_nothing_new():
    """warmup() precompiles every program the stream's AR windows need —
    a live first gap must reuse them, never stall on a fresh XLA compile
    (VERDICT r3 #1). Counted via the jax_log_compiles hook."""
    sr = 4000
    x, dmg, _, gaps = _clip(sr=sr, n=24_000, gaps=((9_000, 9_120),
                                                   (17_000, 17_110)))
    kw = dict(method="ar", window_s=0.064, max_doublings=1, order=8,
              context_len=64, margin=20)
    rest = StreamRestorer(sr, **kw)
    with _CompileCounter() as during_warmup:
        n = rest.warmup()
    assert n > 0
    assert len(during_warmup) > 0  # warmup really compiled the programs
    with _CompileCounter() as during_feed:
        parts = [rest.feed(dmg[i:i + 3_000])
                 for i in range(0, len(dmg), 3_000)]
        parts.append(rest.flush())
    out = np.concatenate(parts)
    assert out.shape == dmg.shape
    for s, e in gaps:
        assert np.abs(out[s:e]).max() > 1e-4     # gaps actually restored
    assert during_feed == [], during_feed


def test_stream_ar_chunk_size_invariance_bucketed():
    """The AR engine's shape bucketing keeps fills deterministic per
    window, so the chunk-invariance contract holds for AR too."""
    sr = 4000
    _, dmg, _, _ = _clip(sr=sr, n=20_000, gaps=((9_000, 9_150),))
    kw = dict(method="ar", window_s=0.064, max_doublings=1, order=8,
              context_len=64, margin=20)
    outs = [_run(dmg, sr, c, **kw) for c in (900, 5_000, 20_000)]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_tape_append_drop_compaction():
    """_Tape: amortized buffer behind the O(chunk) feed contract —
    append into spare capacity, drop from the front by offset, compact
    only on overflow; view() always equals the live window."""
    from audio_inpainting_tpu.methods.streaming import _Tape

    rng = np.random.default_rng(0)
    tape = _Tape()
    mirror = np.zeros(0, np.float32)
    for i in range(300):
        chunk = rng.standard_normal(rng.integers(1, 5000)).astype(np.float32)
        tape.append(chunk)
        mirror = np.concatenate([mirror, chunk])
        if rng.random() < 0.5 and len(mirror) > 10:
            d = int(rng.integers(0, len(mirror)))
            tape.drop(d)
            mirror = mirror[d:]
        assert len(tape) == len(mirror)
        np.testing.assert_array_equal(tape.view(), mirror)
    # writes through the view must stick (the composite path relies on it)
    tape.view()[:5] = 7.0
    np.testing.assert_array_equal(tape.view()[:5], np.full(5, 7.0, np.float32))
    # drop beyond the end clamps
    tape.drop(10**9)
    assert len(tape) == 0


def test_incremental_detection_matches_find_gaps_oracle():
    """The O(chunk) incremental scanner must produce EXACTLY the spans the
    old full-buffer path computed: find_gaps(signal, 0.01, min_len=100)
    (strictly > 100) merged with the windowed engine's 2*margin rule —
    regardless of how the stream is chunked."""
    from audio_inpainting_tpu.corrupt import find_gaps
    from audio_inpainting_tpu.methods.windowed import _merge_close

    rng = np.random.default_rng(7)
    n = 30_000
    x = (0.3 + 0.2 * rng.random(n)).astype(np.float32)  # loud everywhere
    x *= np.where(rng.random(n) < 0.5, -1, 1)
    # quiet runs at and around the min_len boundary, some closer than
    # 2*margin so merging matters, one touching the stream end
    runs = [(1_000, 1_100), (2_000, 2_101), (2_160, 2_400), (9_000, 9_050),
            (15_000, 16_500), (16_560, 16_700), (29_800, 30_000)]
    for s, e in runs:
        x[s:e] = 1e-4 * rng.standard_normal(e - s)

    margin = 50
    want = _merge_close(find_gaps(x, threshold=0.01, min_len=100),
                        2 * margin)

    for seed in range(3):
        r2 = np.random.default_rng(seed)
        rest = StreamRestorer(8_000, method="linear", window_s=0.5,
                              margin=margin)
        i = 0
        while i < n:
            c = int(r2.integers(1, 997))
            rest._buf.append(x[i:i + c])
            rest._out.append(x[i:i + c])
            rest._scan_chunk(x[i:i + c])
            rest._total += len(x[i:i + c])
            i += c
        got, tail_start = rest._detect()
        assert got == [tuple(g) for g in want], (got, want)
        # the trailing run is open: tail_start is its absolute start
        assert tail_start == 29_800


def test_concurrent_streams_share_programs_and_stay_independent():
    """Serving many live streams in one process: compiled window programs
    are shared (stream B, fed after stream A warmed, compiles NOTHING),
    and interleaved feeding changes no bytes vs running each stream
    alone."""
    sr = 4000
    _, dmg_a, _, _ = _clip(sr=sr, n=20_000, gaps=((9_000, 9_150),))
    _, dmg_b, _, _ = _clip(sr=sr, n=20_000, gaps=((5_000, 5_200),
                                                  (14_000, 14_120)))
    kw = dict(method="ar", window_s=0.064, max_doublings=1, order=8,
              context_len=64, margin=20)

    solo_a = _run(dmg_a, sr, 2_000, **kw)
    solo_b = _run(dmg_b, sr, 2_000, **kw)

    ra, rb = StreamRestorer(sr, **kw), StreamRestorer(sr, **kw)
    ra.warmup()
    with _CompileCounter() as during:
        outs_a, outs_b = [], []
        for i in range(0, 20_000, 2_000):
            outs_a.append(ra.feed(dmg_a[i:i + 2_000]))
            outs_b.append(rb.feed(dmg_b[i:i + 2_000]))
        outs_a.append(ra.flush())
        outs_b.append(rb.flush())
    assert during == [], during          # all programs shared via jit cache
    np.testing.assert_array_equal(np.concatenate(outs_a), solo_a)
    np.testing.assert_array_equal(np.concatenate(outs_b), solo_b)


def test_stream_warmup_unet_then_feed_compiles_nothing_new():
    """Same contract as the AR warmup pin, for the U-Net path: its program
    shape depends only on the window size, so one warmed program per size
    must cover every live window (keep/stripe masks are data)."""
    sr = 4000
    x, dmg, _, gaps = _clip(sr=sr, n=24_000, gaps=((9_000, 9_120),
                                                   (17_000, 17_110)))
    kw = dict(method="unet", window_s=0.064, max_doublings=1, margin=20,
              epochs=2, scan_chunk=2)
    rest = StreamRestorer(sr, **kw)
    with _CompileCounter() as during_warmup:
        n = rest.warmup()
    assert n > 0 and len(during_warmup) > 0
    with _CompileCounter() as during_feed:
        parts = [rest.feed(dmg[i:i + 3_000])
                 for i in range(0, len(dmg), 3_000)]
        parts.append(rest.flush())
    out = np.concatenate(parts)
    assert out.shape == dmg.shape
    assert during_feed == [], during_feed


def test_warm_runs_two_sided_fillers_reach_bucket():
    """A near-window-size gap must still be warmable at a high gap-count
    bucket: fillers land on BOTH sides of the main run (round-4 ADVICE
    found left-only placement silently warmed the 8-bucket instead)."""
    from audio_inpainting_tpu.methods.streaming import _warm_runs

    size, margin = 32_768, 20
    runs = _warm_runs(size, int(0.9 * size), 32, margin)
    assert len(runs) == 32
    assert runs == sorted(runs)
    assert all(0 <= s < e <= size for s, e in runs)
    # no pair may merge under the detector's < 2*margin rule
    for (s1, e1), (s2, _) in zip(runs, runs[1:]):
        assert s2 - e1 >= 2 * margin


def test_stream_default_window_is_per_method():
    """window_s=None picks the per-method latency-tuned default
    (VERDICT r4 #5): linear/gp need no training context and should not
    inherit the 10 s window's multi-second placement wait."""
    sr = 8000
    assert StreamRestorer(sr, "linear").window == int(0.5 * sr)
    assert StreamRestorer(sr, "gp").window == int(0.5 * sr)
    assert StreamRestorer(sr, "ar").window == 2 * sr
    assert StreamRestorer(sr, "unet", epochs=1).window == 2 * sr
    assert StreamRestorer(sr, "nmf").window == 10 * sr
    # explicit window_s still wins
    assert StreamRestorer(sr, "linear", window_s=4.0).window == 4 * sr


def test_stream_linear_default_window_latency():
    """With the per-method default, a held linear gap costs well under a
    second of pending latency (was ~5 s p99 at the old 10 s window)."""
    sr = 8000
    _, dmg, _, _ = _clip(sr=sr, n=40_000, gaps=((20_000, 20_400),))
    rest = StreamRestorer(sr, method="linear")
    assert rest.window == 4_000
    peak = 0
    for i in range(0, len(dmg), 800):      # 100 ms chunks
        rest.feed(dmg[i:i + 800])
        peak = max(peak, rest.pending)
    rest.flush()
    # placement wait is ~window/2 + margins, far under 1 s of audio
    assert peak < sr, peak


def _unet_kw(**extra):
    kw = dict(method="unet", window_s=1.0, margin=40, epochs=3,
              scan_chunk=3, adapt_epochs=2)
    kw.update(extra)
    return kw


def test_persistent_unet_chunk_invariance_and_carry():
    """The persistent U-Net path keeps the chunk-invariance contract
    (window restore order is chunking-independent, so the carried-weight
    sequence is too), and actually carries weights across windows."""
    sr = 8000
    _, dmg, _, gaps = _clip(sr=sr, n=32_000, gaps=((9_000, 9_400),
                                                   (22_000, 22_500)))
    outs = []
    rests = []
    for chunk in (2_500, 32_000):
        rest = StreamRestorer(sr, **_unet_kw())
        parts = [rest.feed(dmg[i:i + chunk])
                 for i in range(0, len(dmg), chunk)]
        parts.append(rest.flush())
        outs.append(np.concatenate(parts))
        rests.append(rest)
    np.testing.assert_array_equal(outs[0], outs[1])
    assert rests[0]._unet is not None and rests[0]._unet.params is not None


def test_persistent_unet_opt_out_matches_facade():
    """persist=False restores the round-4 fresh-net-per-window facade
    path (each window an independent api.restore call)."""
    sr = 8000
    _, dmg, _, _ = _clip(sr=sr, n=20_000, gaps=((9_000, 9_300),))
    rest = StreamRestorer(sr, **_unet_kw(persist=False))
    assert rest._unet is None
    parts = [rest.feed(dmg[i:i + 4_000]) for i in range(0, len(dmg), 4_000)]
    parts.append(rest.flush())
    out = np.concatenate(parts)
    assert out.shape == dmg.shape and np.isfinite(out).all()


def test_persistent_unet_never_trains_on_hole_content():
    """THE persistence-safety pin (VERDICT r4 #1): the carried net's
    weights must be bit-identical whatever the holes contain — hole
    columns are excluded from the loss (valid=keep), so sub-threshold
    garbage deep inside a gap can influence the output only through the
    iSTFT phase, never through the weights that persist to later
    windows."""
    sr = 8000
    n = 24_000
    t = np.arange(n)
    x = (0.6 * np.sin(2 * np.pi * 2 * t / sr)
         + 0.2 * np.sin(2 * np.pi * 330 * t / sr)).astype(np.float32)
    gs, ge = 10_000, 13_000
    a = x.copy()
    a[gs:ge] = 0.0
    b = a.copy()
    rng = np.random.default_rng(3)
    # noise >= 1024 samples (the STFT n_fft) inside the hole: every column
    # containing it is 100% damaged -> excluded from the loss AND input
    b[gs + 1024:ge - 1024] = 1e-3 * rng.standard_normal(
        ge - gs - 2048).astype(np.float32)
    import jax

    params = []
    for dmg in (a, b):
        rest = StreamRestorer(sr, **_unet_kw())
        for i in range(0, n, 3_000):
            rest.feed(dmg[i:i + 3_000])
        rest.flush()
        assert rest._unet.params is not None
        params.append(rest._unet.params)
    same = jax.tree_util.tree_map(
        lambda p, q: bool(np.array_equal(np.asarray(p), np.asarray(q))),
        params[0], params[1])
    assert all(jax.tree_util.tree_leaves(same))


def test_persistent_unet_canonical_init_equals_window_init():
    """PersistentUNetStream inits on a fixed canonical shape so ONE init
    program covers every window size — valid because the conv param tree
    (shapes AND initializer draws) is input-size independent."""
    import jax
    import jax.numpy as jnp

    from audio_inpainting_tpu.methods.neural import _jit_init
    from audio_inpainting_tpu.models.packed_unet import PackedSimpleUNet

    model = PackedSimpleUNet(dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    p_canon = _jit_init(model, key, jnp.zeros((1, 8, 32, 1)))["params"]
    p_win = _jit_init(model, key, jnp.zeros((1, 68, 64, 1)))["params"]
    same = jax.tree_util.tree_map(
        lambda p, q: bool(np.array_equal(np.asarray(p), np.asarray(q))),
        p_canon, p_win)
    assert all(jax.tree_util.tree_leaves(same))


def test_persistent_unet_adapts_weights_between_windows():
    """Window 2 must start from window 1's weights and move them (the
    adaptation budget really trains), not retrain from scratch."""
    import jax

    from audio_inpainting_tpu.methods.unet_stream import PersistentUNetStream

    sr = 8000
    t = np.arange(8_000)
    sub = (0.5 * np.sin(2 * np.pi * 220 * t / sr)).astype(np.float32)
    mask = np.ones(8_000, bool)
    mask[3_000:3_400] = False
    win = sub.copy()
    win[3_000:3_400] = 0.0

    ps = PersistentUNetStream(seed=0, adapt_epochs=2, epochs=3, scan_chunk=3)
    out1 = ps.restore_window(win, mask)
    p1 = jax.tree_util.tree_map(np.asarray, ps.params)
    out2 = ps.restore_window(win, mask)
    p2 = ps.params
    assert out1.shape == out2.shape == win.shape
    moved = jax.tree_util.tree_map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))), p1, p2)
    assert any(jax.tree_util.tree_leaves(moved))  # adaptation trained

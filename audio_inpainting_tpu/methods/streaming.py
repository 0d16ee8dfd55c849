"""Streaming restoration: bounded-latency inpainting of unbounded streams.

Beyond-reference capability, and the natural end of the serving ladder
(single file -> corpus `serve` -> live HTTP -> unbounded stream). The
reference operates on one whole 10 s clip per script run; this module
restores audio that arrives in chunks of ANY size — a live feed, a tape
transfer, an hours-long broadcast — emitting restored samples as soon as
they are final and never holding more than O(window) history.

TPU-native reasoning is the same as methods/windowed.py, sharpened by the
streaming constraint: every restore runs on a STATIC window shape (the base
window or a power-of-two multiple, capped), so XLA compiles log-many
programs for the whole stream and every later window reuses them. Work is
O(damage), not O(stream).

Contract
--------
- Clean samples pass through BIT-IDENTICAL, in order, exactly once.
- Output is invariant to how the stream is chunked (1-sample feeds and one
  big feed produce the same bytes): windows are planned in ABSOLUTE stream
  coordinates, and a damage group is only restored once enough context has
  arrived that its window placement can never change.
- Latency is bounded: a clean stream is emitted within ``margin`` samples
  + the trailing sub-threshold run (a run touching the buffer end may still
  grow into damage, so it is held); a detected gap is held only until
  ``window``-scale right context arrives. Monster gaps beyond the window
  cap are restored in fixed-size tiles so even an unbounded silence cannot
  grow the buffer without bound.

    rest = StreamRestorer(sr, method="ar")
    for chunk in source:
        sink(rest.feed(chunk))
    sink(rest.flush())
"""

from __future__ import annotations

import numpy as np

from .windowed import composite_weight


class _Tape:
    """Append/drop float32 buffer with amortized-O(1) operations.

    The first streaming implementation re-concatenated the whole history
    on every feed (O(buffer) per chunk), which capped the warm RTF at
    ~1.8x realtime on the v5e box regardless of method — the engine was
    host-copy-bound, not restore-bound. This tape appends into spare
    capacity (doubling growth), drops from the front by advancing an
    offset, and physically compacts only when an append would overflow —
    so per-feed buffer work is O(chunk) amortized while ``view()`` stays
    one contiguous zero-copy slice.
    """

    __slots__ = ("_arr", "_off", "_end")

    def __init__(self):
        self._arr = np.empty(1 << 16, np.float32)
        self._off = 0
        self._end = 0

    def __len__(self) -> int:
        return self._end - self._off

    def view(self) -> np.ndarray:
        return self._arr[self._off:self._end]

    def append(self, chunk: np.ndarray) -> None:
        n = len(chunk)
        if self._end + n > len(self._arr):
            live = self._end - self._off
            need = live + n
            if need * 2 <= len(self._arr):
                # in-place compaction is overlap-free BY the need*2 guard:
                # live <= len/2 while off = end - live >= len - len/2, so
                # dst [0, live) ends before src [off, ...) begins
                self._arr[:live] = self._arr[self._off:self._end]
            else:
                new = np.empty(max(len(self._arr) * 2, need * 2), np.float32)
                new[:live] = self._arr[self._off:self._end]
                self._arr = new
            self._off, self._end = 0, live
        self._arr[self._end:self._end + n] = chunk
        self._end += n

    def drop(self, n: int) -> None:
        self._off = min(self._off + n, self._end)


# Per-method default stream window (VERDICT r4 #5). p99 pending latency is
# the window-placement wait (~window/2 + right context), NOT compute
# (BASELINE.md streaming table: linear's 5.08 s p99 was purely the 10 s
# window), so a method should not buy more window than its fill actually
# uses: linear interpolates from the gap's immediate endpoints, GP fits a
# short segment (the reference confines it to 0.05 s, main1_gp.py:46-49),
# AR uses 1000-sample contexts, the U-Net trains on the window's
# spectrogram (2 s is the measured quality/latency knee). NMF and anything
# unlisted keep the clip-scale 10 s window (the reference factorizes the
# whole 10 s spectrogram, main4_NMF_gap.py:45-47).
DEFAULT_WINDOW_S = {"linear": 0.5, "gp": 0.5, "ar": 2.0, "unet": 2.0}


def _warm_runs(size: int, gap_len: int, n_runs: int,
               margin: int) -> list[tuple[int, int]]:
    """Damage-run layout for one synthetic warmup window: a centered
    ``gap_len`` run plus ``n_runs - 1`` single-sample fillers, spaced
    ``step`` apart so none merge. Fillers go on BOTH sides of the main
    run: for gap_len near the window size the left side alone runs out of
    room, and warmup would silently compile the 8-bucket instead of the
    requested (large-length, high-count) program (round-4 ADVICE)."""
    s0 = max((size - gap_len) // 2, 1)
    e0 = min(s0 + gap_len, size)
    runs = [(s0, e0)]
    # tightest non-merging spacing: runs separated by >= 2*margin never
    # merge (_close_run's rule), so step-1 == 2*margin+1 keeps every
    # filler distinct while fitting the most runs beside a large gap
    step = max(2 * margin + 2, 64)
    lpos, rpos = 0, e0 + step
    while len(runs) < n_runs:
        if lpos + 1 <= s0 - 2 * margin:
            runs.append((lpos, lpos + 1))
            lpos += step
        elif rpos + 1 <= size:
            runs.append((rpos, rpos + 1))
            rpos += step
        else:
            break
    runs.sort()
    return runs


class StreamRestorer:
    """Incremental windowed restorer over the `api.restore` facade.

    sr/method/window_s/context/margin/threshold/seed/cfg_kwargs mean exactly
    what they mean for methods/windowed.restore_windowed, except that
    window_s=None (the default) picks the per-method latency-tuned window
    from DEFAULT_WINDOW_S. max_doublings caps an oversized damage group's
    window at ``window * 2**max_doublings``; damage wider than the cap is
    restored in cap-sized tiles (each tile sees the rest of the span as
    damage via the foreign-gap mask), which bounds both compile count and
    buffer memory for arbitrarily long dropouts.

    method="unet" carries ONE net across the stream's windows by default
    (methods/unet_stream.py: full ``epochs`` budget on the first window,
    ``adapt_epochs`` warm-started on every later one — the round-5 change
    that took streaming U-Net past realtime). ``persist=False`` restores
    the round-4 fresh-net-per-window behavior.
    """

    def __init__(self, sr: int, method: str = "linear", *,
                 window_s: float | None = None, context: int = 5000,
                 margin: int = 50, threshold: float = 1e-4, seed: int = 0,
                 max_doublings: int = 3, **cfg_kwargs):
        if window_s is None:
            window_s = DEFAULT_WINDOW_S.get(method, 10.0)
        self._unet = None
        if method == "unet":
            persist = cfg_kwargs.pop("persist", True)
            adapt_epochs = cfg_kwargs.pop("adapt_epochs", 100)
            if persist:
                from .unet_stream import PersistentUNetStream

                self._unet = PersistentUNetStream(
                    seed=seed, adapt_epochs=adapt_epochs, **cfg_kwargs)
        if method == "ar":
            # same engine policy as methods/windowed.py: bucketed shapes so
            # novel gap lengths reuse compiled programs instead of stalling
            # a live stream on a fresh XLA compile (see ARConfig.bucket)
            cfg_kwargs.setdefault("bucket", True)
        self.sr = sr
        self.method = method
        self.margin = int(margin)
        self.threshold = threshold
        self.seed = seed
        self.cfg_kwargs = cfg_kwargs
        self.window = max(int(round(window_s * sr)), 256)
        self.ctx = max(min(context, self.window // 8), 1)
        self.cap = self.window << max(int(max_doublings), 0)
        # tile length for spans beyond the cap: a full-cap window fits one
        # tile plus its context on each side
        self.tile = self.cap - 2 * self.ctx

        self._buf = _Tape()                    # raw input (never mutated)
        self._out = _Tape()                    # fills composited over raw
        self._base = 0                         # absolute index of _buf[0]
        self._total = 0                        # absolute samples received
        self._emit = 0                         # absolute emit watermark
        self._filled: list[tuple[int, int]] = []   # restored absolute spans
        self._ended = False
        # incremental detection state: detection cost must be O(chunk) per
        # feed, not O(buffer) — spans are discovered as their runs CLOSE
        # (a loud sample arrives) and carried in absolute coordinates
        self._spans: list[list[int]] = []      # closed runs > min_len, merged
        self._run_start: int | None = None     # open sub-threshold suffix
        self._min_len = 100                    # find_gaps' default, exactly

    # ------------------------------------------------------------- public

    def warmup(self, max_gap_s: float | None = None, *,
               max_runs: int = 32) -> int:
        """Precompile every window program a live stream can hit, BEFORE
        the first ``feed()`` — so the first real gap never stalls the
        stream on XLA compiles (measured minutes for a cold AR/U-Net
        window program on the v5e; BASELINE.md "Windowed long-file
        restore").

        For each window size this restorer can plan (the base window and
        its doublings up to the cap) — and, for AR, whose program shape
        also depends on the damage shape, for each (gap-count, run-length)
        bucket (``ARConfig.bucket``, on by default inside the engines) —
        synthesizes one representative damaged window and restores it
        through the SAME ``api.restore`` call ``_restore_piece`` makes.
        The programs compiled here are therefore byte-for-byte the ones
        live damage will need; tests/test_streaming.py pins that a
        warmed-up stream compiles nothing new.

        max_gap_s: bound on the longest damage span the caller expects
        (fewer programs, faster warmup); None covers every shape up to the
        window cap. max_runs: most distinct damage runs expected per
        window (AR only; buckets jump 8 -> 32 -> 128, and real music
        carries 13-14 natural quiet runs per 2 s window, so the default
        covers the 32-bucket — denser damage than max_runs compiles one
        more program on first encounter).

        "linear" compiles nothing; "gp" is excluded from the guarantee
        (its fit shape follows the per-window valid-sample count, which
        does not bucket). Returns the number of windows exercised.
        Idempotent; call any time before (or between) feeds.
        """
        if self.method in ("linear", "gp"):
            return 0
        from ..utils.compilecache import enable_persistent_cache
        from .ar import bucket_gap_count, bucket_max_len

        # persistent compile cache (VERDICT r4 #2): a restarted serving
        # process re-loads these programs from disk instead of re-paying
        # the full compile bill (no-op on CPU backends — see the module)
        enable_persistent_cache()

        span_cap = None if max_gap_s is None else max(
            int(max_gap_s * self.sr), 1)
        count = 0
        size = self.window
        while True:
            if self.method == "ar":
                run_cap = size if span_cap is None else min(size, span_cap)
                gpad = bucket_gap_count(1)
                gpad_max = bucket_gap_count(max(int(max_runs), 1))
                while gpad <= gpad_max:
                    L = bucket_max_len(1)
                    lmax = bucket_max_len(run_cap)
                    while L <= lmax:
                        count += self._warm_one(size, min(size - 1, L), gpad)
                        L *= 2
                    # the gap-count ladder steps x4 (8, 32, 128 — see
                    # bucket_gap_count); a x2 step warmed every bucket
                    # twice for no extra program coverage (round-4 ADVICE)
                    gpad *= 4
            else:
                count += self._warm_one(size, max(size // 4, 1), 1)
            if size >= self.cap:
                break
            if span_cap is not None and span_cap + 2 * self.ctx <= size:
                break          # the planner never doubles past a fit
            size *= 2
        return count

    def _warm_one(self, size: int, gap_len: int, n_runs: int) -> int:
        """Restore one synthetic window: a centered ``gap_len`` run plus
        ``n_runs - 1`` single-sample runs (so the gap-count bucket is
        ``n_runs``), on a loud deterministic carrier."""
        t = np.arange(size, dtype=np.float32)
        sub = (0.5 * np.sin(2.0 * np.pi * 220.0 / self.sr * t)
               + 0.25 * np.sin(2.0 * np.pi * 733.0 / self.sr * t)
               ).astype(np.float32)
        runs = _warm_runs(size, gap_len, n_runs, self.margin)
        mask = np.ones(size, bool)
        for s, e in runs:
            mask[s:e] = False
        for s, e in runs:
            sub[s:e] = 0.0
        if self._unet is not None:
            self._unet.warm_window(sub, mask)
        else:
            # fetch the throwaway result (np.asarray inside _call_method):
            # each program's FIRST execution pays an executable-load over
            # the tunnel (~4 s/program measured round 5), and a dispatch-
            # only warmup merely defers that queue to the first live
            # restore, which then stalls for the whole backlog (measured:
            # one 271 s feed stall with zero new compiles)
            self._call_method(sub, runs, mask)
        return 1

    def feed(self, chunk) -> np.ndarray:
        """Append samples; return every restored sample that is now final."""
        if self._ended:
            raise RuntimeError("stream already flushed")
        chunk = np.asarray(chunk, np.float32)
        self._buf.append(chunk)
        self._out.append(chunk)
        self._scan_chunk(chunk)
        self._total += len(chunk)
        return self._advance(final=False)

    def flush(self) -> np.ndarray:
        """End of stream: restore what remains and emit everything."""
        if self._ended:
            return np.zeros(0, np.float32)
        self._ended = True
        return self._advance(final=True)

    @property
    def pending(self) -> int:
        """Samples received but not yet emitted (the current latency)."""
        return self._total - self._emit

    # ------------------------------------------------------------ engine

    def _scan_chunk(self, chunk: np.ndarray) -> None:
        """Incremental damage detection over ONE chunk (absolute start =
        self._total, pre-append). Maintains the closed-span list and the
        open trailing-run start so detection is O(chunk) per feed —
        re-scanning the whole buffer every feed made the old engine
        host-bound (warm RTF ~1.8x regardless of method). Semantics are
        find_gaps' exactly: a run counts once STRICTLY longer than
        ``min_len``; nearby runs merge when separated by < 2*margin (the
        windowed engine's _merge_close rule), applied tail-wise since runs
        close in stream order."""
        if len(chunk) == 0:
            return
        a0 = self._total
        thr = max(self.threshold, 0.01)
        quiet = np.abs(chunk) < thr
        d = np.diff(quiet.astype(np.int8))
        starts = (np.flatnonzero(d == 1) + 1).tolist()
        ends = (np.flatnonzero(d == -1) + 1).tolist()
        if quiet[0]:
            starts.insert(0, 0)
        if quiet[-1]:
            ends.append(len(chunk))

        if self._run_start is not None:
            if quiet[0]:
                # the open run continues into this chunk: its start stays
                starts[0] = self._run_start - a0
            else:
                # chunk opens loud: the carried run closes at a0
                self._close_run(self._run_start, a0)
                self._run_start = None

        for s, e in zip(starts, ends):
            rs, re_ = a0 + s, a0 + e
            if re_ == a0 + len(chunk) and quiet[-1]:
                self._run_start = rs          # still open; close later
            else:
                self._close_run(rs, re_)
        if not quiet[-1]:
            self._run_start = None

    def _close_run(self, rs: int, re_: int) -> None:
        if re_ - rs <= self._min_len:
            return
        if self._spans and rs - self._spans[-1][1] < 2 * self.margin:
            self._spans[-1][1] = max(self._spans[-1][1], re_)
        else:
            self._spans.append([rs, re_])

    def _detect(self) -> tuple[list[tuple[int, int]], int]:
        """(merged absolute damage spans, absolute trailing-run start).

        The trailing run is ANY sub-threshold suffix (even under the gap
        detector's min_len) — it may still grow into damage, so everything
        from it on is unsafe to finalize or emit. An open run already past
        min_len is reported as a provisional span ending at the stream
        head (so monster dropouts tile out while still growing)."""
        spans = [(s, e) for s, e in self._spans if e > self._base]
        tail_start = (self._total if self._run_start is None
                      else self._run_start)
        if (self._run_start is not None
                and self._total - self._run_start > self._min_len):
            rs = self._run_start
            if spans and rs - spans[-1][1] < 2 * self.margin:
                spans[-1] = (spans[-1][0], self._total)
            else:
                spans.append((rs, self._total))
        return spans, tail_start

    def _geometry(self, s0: int, e1: int) -> tuple[int, int]:
        """Window (w0, size) for a span, absolute coords, capped doubling."""
        span = e1 - s0
        size = self.window
        while span + 2 * self.ctx > size and size < self.cap:
            size *= 2
        w0 = max(0, s0 - (size - span) // 2)
        return w0, size

    def _pieces(self, s0: int, e1: int) -> list[tuple[int, int]]:
        """Split a span beyond the cap into tiles on the ABSOLUTE tile grid
        (k*tile boundaries, not s0-relative): history trimming can truncate
        a re-detected span's left edge, and grid alignment keeps the
        remaining pieces' identities — and therefore their fills — bit-
        identical regardless of where the truncation landed."""
        if e1 - s0 + 2 * self.ctx <= self.cap:
            return [(s0, e1)]
        return [(max(s0, k * self.tile), min((k + 1) * self.tile, e1))
                for k in range(s0 // self.tile,
                               -(-e1 // self.tile))]

    def _group(self, spans: list[tuple[int, int]], tail_start: int,
               final: bool):
        """Partition spans into restore groups — the offline planner's rule
        (windowed.plan_windows): consecutive spans join a group while the
        group extent + 2*ctx still fits the BASE window, so one window
        restore serves every span inside it. Real music carries 13-14
        natural sub-threshold runs per 2 s (BASELINE.md), and restoring
        each in its own window made window count — not per-window cost —
        the streaming wall (round-5 measurement: 166 spans vs 25 grouped
        windows on the 2-minute bench program).

        Grouping must be CHUNK-INVARIANT, so a group only closes when its
        membership can never change: (a) the last member can no longer
        grow or merge (2*margin of loud samples follow it), and (b) no
        future span can join — every future run starts at/after
        ``tail_start`` and needs > min_len samples, so once
        ``tail_start + min_len`` ends past the group's window reach,
        membership is fixed. This waits ~window (not ~window/2) before
        restoring a lone gap — the latency cost of the throughput win;
        pick a smaller window_s when latency dominates.

        Returns [(s0, e1, members, closed)] in stream order.
        """
        groups: list[list] = []
        for s, e in spans:
            if groups and e - groups[-1][0] + 2 * self.ctx <= self.window:
                groups[-1][1] = e
                groups[-1][2].append((s, e))
            else:
                groups.append([s, e, [(s, e)]])
        out = []
        for s0, e1, members in groups:
            if final:
                closed = True
            else:
                full = e1 - s0 + 2 * self.ctx > self.window
                no_join = full or (tail_start + self._min_len + 2 * self.ctx
                                   >= s0 + self.window)
                closed = no_join and e1 + 2 * self.margin <= tail_start
            out.append((s0, e1, members, closed))
        return out

    def _advance(self, final: bool) -> np.ndarray:
        spans, tail_start = self._detect()
        blockers: list[tuple[int, int]] = []

        def covered(m):
            return (m[1] <= self._emit
                    or any(fs <= m[0] and m[1] <= fe
                           for fs, fe in self._filled))

        for s0, e1, members, closed in self._group(spans, tail_start, final):
            if e1 - s0 + 2 * self.ctx > self.window:
                # oversized single span: capped window doubling, then
                # absolute-grid tiles (a span this large can never share a
                # group — the join rule requires fitting the base window)
                for cs, ce in self._pieces(s0, e1):
                    if covered((cs, ce)):
                        continue                 # emitted/restored = final
                    w0, size = self._geometry(cs, ce)
                    # a piece is final when its window is fully buffered AND
                    # its identity can never change: either 2*margin of loud
                    # samples follow it (no future merge can absorb it), or
                    # a full tile of known silence follows it inside an
                    # oversized span (the tile grid is absolute, so growth
                    # only appends pieces)
                    settled = (ce + 2 * self.margin <= tail_start
                               or e1 - ce >= self.tile)
                    if final or (self._total >= w0 + size and settled):
                        self._restore_piece([(cs, ce)], w0, size, spans)
                    else:
                        blockers.append((cs, ce))
                continue
            live = [m for m in members if not covered(m)]
            if not live:
                continue
            # window placed by the FULL group extent (not just the live
            # members), so placement — and therefore the fill — does not
            # depend on how much history was already emitted
            w0, size = self._geometry(s0, e1)
            if final or (closed and self._total >= w0 + size):
                self._restore_piece(live, w0, size, spans)
            else:
                blockers.append((live[0][0], e1))

        if final:
            watermark = self._total
        else:
            watermark = self._total - self.margin
            # a sub-detection-length quiet suffix may still grow into
            # damage: hold it (and margin before it). A DETECTED ongoing
            # span's samples are all owned by pieces — filled ones are
            # final and emit; unfinished ones are blockers below — so a
            # monster dropout streams out tile by tile instead of pinning
            # the watermark at its start.
            if (tail_start < self._total
                    and not any(e1 >= self._total for _, e1 in spans)):
                watermark = min(watermark, tail_start - self.margin)
            if blockers:
                watermark = min(watermark, min(b[0] for b in blockers)
                                - self.margin)
        watermark = max(watermark, self._emit)

        lo = self._emit - self._base
        hi = watermark - self._base
        out = self._out.view()[lo:hi].copy()
        self._emit = watermark

        # retention: keep cap history behind the watermark (a future gap
        # just past it can reach back (cap - span)/2 < cap), and never trim
        # into an unrestored blocker's window
        floor = self._emit - self.cap
        for cs, ce in blockers:
            floor = min(floor, self._geometry(cs, ce)[0])
        floor = max(floor, self._base)
        if floor > self._base:
            drop = floor - self._base
            self._buf.drop(drop)
            self._out.drop(drop)
            self._base = floor
            self._filled = [(fs, fe) for fs, fe in self._filled
                            if fe > floor - self.cap]
            self._spans = [sp for sp in self._spans if sp[1] > floor]
        return out

    def _restore_piece(self, members: list[tuple[int, int]], w0: int,
                       size: int, spans: list[tuple[int, int]]) -> None:
        """Restore ONE window and composite the fill into _out over every
        member span (the same extraction/masking/composite contract as
        restore_windowed: foreign damage masked, validity mirrored through
        any reflect padding, margin crossfades at each member boundary)."""
        from .. import api

        hi = min(w0 + size, self._total)
        bl, bh = w0 - self._base, hi - self._base
        sub = self._buf.view()[bl:bh].copy()
        mask = np.ones(hi - w0, bool)
        for s, e in spans:
            ls, le = max(s, w0) - w0, min(e, hi) - w0
            if ls < le:
                mask[ls:le] = False
        if hi - w0 < size:                       # end of stream: reflect-pad
            pad = size - (hi - w0)
            sub = np.pad(sub, (0, pad), mode="reflect")
            mask = np.pad(mask, (0, pad), mode="reflect")
        flips = np.diff(mask.astype(np.int8))
        starts = (np.flatnonzero(flips == -1) + 1).tolist()
        ends = (np.flatnonzero(flips == 1) + 1).tolist()
        if not mask[0]:
            starts.insert(0, 0)
        if not mask[-1]:
            ends.append(size)
        local = list(zip(starts, ends))

        restored = self._call_method(sub, local, mask)

        w = composite_weight(size, [(s - w0, e - w0) for s, e in members],
                             self.margin)
        m = hi - w0
        seg = slice(bl, bh)
        ov = self._out.view()      # writes through to the tape's storage
        ov[seg] = (1.0 - w[:m]) * ov[seg] + w[:m] * restored[:m]
        self._filled.extend(members)

    def _call_method(self, sub: np.ndarray, local: list[tuple[int, int]],
                     mask: np.ndarray) -> np.ndarray:
        """The ONE `api.restore` invocation shape both the live path
        (`_restore_piece`) and `warmup` go through — warmup's whole value
        is that it compiles exactly the programs this call will need.
        The persistent-U-Net path routes to the carried per-stream net
        instead (same masks, same composite contract)."""
        from .. import api

        if self._unet is not None:
            return self._unet.restore_window(sub, mask)
        return np.asarray(api.restore(
            sub, self.sr, method=self.method, gaps=local, mask=mask,
            threshold=self.threshold, seed=self.seed, **self.cfg_kwargs),
            np.float32)


def restore_stream(chunks, sr: int, method: str = "linear",
                   **kwargs):
    """Generator convenience: yield restored chunks for an iterable of
    input chunks (see StreamRestorer for the contract)."""
    rest = StreamRestorer(sr, method, **kwargs)
    for chunk in chunks:
        out = rest.feed(chunk)
        if len(out):
            yield out
    out = rest.flush()
    if len(out):
        yield out

#!/usr/bin/env python
"""Streaming-restore throughput: real-time factor of StreamRestorer.

Tiles the reference clip into a long program, injects dropouts at a fixed
rate, feeds it through ``methods.streaming.StreamRestorer`` in real-time
sized chunks, and reports:

  - RTF (audio seconds restored per wall second; >1 = faster than realtime)
  - peak latency (max ``pending`` samples across the run, in ms)
  - clean passthrough check (restored == input outside damage windows)
  - per-gap fill sanity (no fill left at the detection threshold)

Usage:
    python tools/stream_throughput.py [--minutes 2] [--method linear|ar|nmf]
                                      [--gap-every-s 7] [--gap-ms 300]
                                      [--chunk-ms 100]

The steady-state number is what matters for serving: the FIRST damaged
window pays the XLA compile (log-many static shapes), later windows reuse
it, so the tool reports both the cold pass and a second warm pass.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from audio_inpainting_tpu.io import load_mono_normalized  # noqa: E402
from audio_inpainting_tpu.methods.streaming import StreamRestorer  # noqa: E402

REF = "/root/reference/vocals_accompaniment_10s.wav"


def build_program(minutes: float, gap_every_s: float, gap_ms: float,
                  seed: int = 0):
    sr, clip = load_mono_normalized(REF)
    n = int(minutes * 60 * sr)
    reps = -(-n // len(clip))
    audio = np.tile(clip, reps)[:n].astype(np.float32)
    rng = np.random.default_rng(seed)
    gap_len = int(gap_ms / 1000 * sr)
    spans = []
    t = int(gap_every_s * sr)
    while t + gap_len < n - sr:
        s = t + int(rng.integers(0, sr // 2))
        audio_damaged_span = (s, s + gap_len)
        spans.append(audio_damaged_span)
        t += int(gap_every_s * sr)
    damaged = audio.copy()
    for s, e in spans:
        damaged[s:e] = 0.0
    return sr, audio, damaged, spans


def run_pass(tag: str, sr: int, damaged: np.ndarray, method: str,
             chunk: int, **kw) -> tuple[np.ndarray, float, int]:
    rest = StreamRestorer(sr, method=method, **kw)
    outs = []
    peak_pending = 0
    t0 = time.time()
    for i in range(0, len(damaged), chunk):
        outs.append(rest.feed(damaged[i:i + chunk]))
        peak_pending = max(peak_pending, rest.pending)
    outs.append(rest.flush())
    wall = time.time() - t0
    out = np.concatenate(outs)
    rtf = (len(damaged) / sr) / wall
    print(f"[{tag}] {len(damaged)/sr:.0f}s audio in {wall:.2f}s wall "
          f"-> RTF {rtf:.1f}x, peak latency "
          f"{peak_pending/sr*1000:.0f} ms", file=sys.stderr)
    return out, wall, peak_pending


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=2.0)
    ap.add_argument("--method", default="linear")
    ap.add_argument("--gap-every-s", type=float, default=7.0)
    ap.add_argument("--gap-ms", type=float, default=300.0)
    ap.add_argument("--chunk-ms", type=float, default=100.0)
    ap.add_argument("--window-s", type=float, default=10.0)
    args = ap.parse_args()

    sr, clean, damaged, spans = build_program(
        args.minutes, args.gap_every_s, args.gap_ms)
    chunk = int(args.chunk_ms / 1000 * sr)
    print(f"[setup] {args.minutes:.1f} min, {len(spans)} gaps of "
          f"{args.gap_ms:.0f} ms, chunk {chunk} samples", file=sys.stderr)

    out_cold, wall_cold, _ = run_pass(
        "cold", sr, damaged, args.method, chunk, window_s=args.window_s)
    out, wall, peak = run_pass(
        "warm", sr, damaged, args.method, chunk, window_s=args.window_s)

    assert len(out) == len(damaged), (len(out), len(damaged))
    # clean passthrough: outside every gap's restore window (gap +- window),
    # output must be BIT-identical to the input
    guard = int(args.window_s * sr)
    dirty = np.zeros(len(damaged), bool)
    for s, e in spans:
        dirty[max(0, s - guard):e + guard] = True
    exact = np.array_equal(out[~dirty], damaged[~dirty])
    # every injected gap got a non-silent fill
    filled = all(np.abs(out[s:e]).max() > 1e-3 for s, e in spans)
    snr_gaps = [
        10 * np.log10(np.sum(clean[s:e] ** 2)
                      / (np.sum((clean[s:e] - out[s:e]) ** 2) + 1e-10))
        for s, e in spans]
    print(f"[check] passthrough_exact={exact} all_gaps_filled={filled} "
          f"gap_snr mean={np.mean(snr_gaps):.2f} dB", file=sys.stderr)

    import json
    print(json.dumps({
        "method": args.method, "minutes": args.minutes,
        "gaps": len(spans), "rtf_cold": round((len(damaged)/sr)/wall_cold, 1),
        "rtf_warm": round((len(damaged)/sr)/wall, 1),
        "peak_latency_ms": round(peak / sr * 1000, 1),
        "passthrough_exact": bool(exact), "all_gaps_filled": bool(filled),
        "gap_snr_mean_db": round(float(np.mean(snr_gaps)), 2)}))
    return 0 if exact and filled else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Overlap-add gain equalization for STFT-frame-dropout corruption.

Beyond-reference restoration stage (the reference has no equivalent; its
part-1 AR simply fills blind-detected silent runs, main3_AR_text_mask.py).

When corruption zeroes whole STFT columns and the damaged audio is produced
by inverse-STFT (the part-1 scenario, main5_UNet_mask.py:111-156), each
damaged sample is EXACTLY the clean sample scaled by a computable gain:

    damaged(t) = x(t) * a(t),   a(t) = sum_{k kept} w^2(t-kh) / sum_k w^2(t-kh)

because the centered iSTFT overlap-adds synthesis-window-weighted frames and
normalizes by the full squared-window OLA. Dividing by a(t) where it is
bounded away from zero therefore recovers the clean signal exactly (up to
int16 quantization); only the deep interior of each dropped run (a ~ 0)
needs generative fill (AR).

Blind detection of the dropped columns is exact for runs of >= n_fft/hop
consecutive dropped frames: a sample is deeply silent iff every frame
covering it was dropped, so a dropped run k0..k1 predicts deep silence on
exactly [c_{k0-1}+win/2, c_{k1+1}-win/2) with c_k = k*hop. Inverting that
predicate per observed silent run gives the largest frame run consistent
with the observation — natural quiet passages (which also produce
sub-threshold runs) mark at most the few frames whose predicted silence fits
inside them, and those frames' coverage is itself near-silent, bounding any
equalization error by the detection threshold.

Measured on the part-1 clip (tools/ar_part1_ab.py machinery): detection
565/564 columns (1 false positive, 0 false negatives); equalization + AR
fill (texture_scale=0.1) scores global SNR 4.99 dB vs 4.87 damaged and
LSD 12.20 vs the reference artifact's 13.01 (baseline_cpu.json
"root/fixed_ar_random").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..corrupt.detect import find_gaps
from ..ops.stft import hann_window


def detect_dropped_frames(damaged: np.ndarray, n_frames: int, hop: int = 256,
                          win: int = 1024, threshold: float = 1e-3,
                          min_run: int = 50) -> np.ndarray:
    """Blind-detect dropped STFT columns from deep-silent runs.

    Returns a bool (n_frames,) array, True = dropped. Exact (given the
    frame-dropout model) for runs of >= win/hop consecutive dropped frames.
    """
    half = win // 2
    dropped = np.zeros(n_frames, bool)
    for s, e in find_gaps(damaged, threshold=threshold, min_len=min_run):
        # largest frame run whose predicted silence [c_{k0-1}+half,
        # c_{k1+1}-half) fits inside the observed silent run [s, e)
        k0 = int(np.ceil((s - half + hop) / hop))
        k1 = int(np.floor((e + half - hop) / hop))
        k0 = max(k0, 0)
        k1 = min(k1, n_frames - 1)
        if k1 >= k0:
            dropped[k0:k1 + 1] = True
    return dropped


@functools.partial(jax.jit, static_argnames=("n", "hop", "win"))
def ola_gain(dropped: jax.Array, n: int, hop: int = 256,
             win: int = 1024) -> jax.Array:
    """Per-sample OLA attenuation a(t) implied by the dropped-column set.

    Matches the centered iSTFT synthesis: frame k contributes w^2 over
    samples [k*hop - win/2, k*hop + win/2); a = kept-weight / full-weight.
    """
    T = dropped.shape[0]
    half = win // 2
    w2 = hann_window(win) ** 2
    idx = (jnp.arange(T) * hop - half)[:, None] + jnp.arange(win)[None, :]
    kept = 1.0 - dropped.astype(jnp.float32)
    num = jnp.zeros(n, jnp.float32).at[idx].add(
        w2[None, :] * kept[:, None], mode="drop")
    den = jnp.zeros(n, jnp.float32).at[idx].add(
        jnp.broadcast_to(w2[None, :], (T, win)), mode="drop")
    return num / jnp.maximum(den, 1e-12)


def equalize_dropped_frames(damaged: np.ndarray, n_frames: int,
                            hop: int = 256, win: int = 1024,
                            threshold: float = 1e-3, floor: float = 0.05,
                            min_gap: int = 8):
    """Equalize OLA attenuation; return (equalized, residual_gaps, a).

    ``residual_gaps`` are the sample runs with a(t) <= floor (deep interior
    of dropped runs) that still need generative fill.
    """
    damaged = np.asarray(damaged, np.float32)
    n = len(damaged)
    dropped = detect_dropped_frames(damaged, n_frames, hop, win, threshold)
    a = np.asarray(ola_gain(jnp.asarray(dropped), n, hop, win))
    eq = np.where(a > floor, damaged / np.maximum(a, floor), damaged)
    eq = np.clip(eq, -1.0, 1.0)

    bad = (a <= floor).astype(np.int8)
    d = np.diff(np.concatenate([[0], bad, [0]]))
    gaps = [(int(s), int(e)) for s, e in
            zip(np.flatnonzero(d == 1), np.flatnonzero(d == -1))
            if e - s >= min_gap]
    return eq, gaps, a

"""L2 blind damage detection: threshold scans over the damaged signal.

The reference detects masks *from the signal* when chaining methods through
WAV files: amplitude threshold 1e-4 for hard zeros
(main3_AR_text_gap.py:34-49, linear_interp_part1.py:52-57) or 0.01 for
iSTFT-produced near-silence (main3_AR_text_mask.py:30-52), run-length
extraction via np.diff, and per-STFT-column silent-fraction tests
(main4_NMF_gap.py:28-40, main4_NMF_mask.py:28-45).

Everything data-parallel runs jitted; only the final variable-length gap
list extraction returns to host (it drives static-shape program structure).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def silence_mask(signal: jax.Array, threshold: float = 1e-4) -> jax.Array:
    """True where |signal| < threshold (candidate damaged samples)."""
    return jnp.abs(signal) < threshold


def find_main_gap(signal: np.ndarray, threshold: float = 1e-4) -> tuple[int, int] | None:
    """Single-gap detector: first and last sub-threshold sample.

    Matches reference main3_AR_text_gap.py:34-49 (returns None if no gap).
    """
    is_gap = np.abs(np.asarray(signal)) < threshold  # host scan, as find_gaps
    idx = np.flatnonzero(is_gap)
    if idx.size == 0:
        return None
    return int(idx[0]), int(idx[-1]) + 1


def find_gaps(signal: np.ndarray, threshold: float = 0.01,
              min_len: int = 100) -> list[tuple[int, int]]:
    """Multi-gap detector: run-length extraction of sub-threshold runs,
    keeping runs longer than ``min_len`` samples.

    Matches reference main3_AR_text_mask.py:30-52 (diff-based starts/ends
    with boundary handling, >100-sample filter).
    """
    # host numpy, not the jitted silence_mask: detection runs over
    # variable-length host signals (each new length would be a fresh XLA
    # compile + device round-trip for one elementwise compare) — windowed
    # long-file restore depends on this staying O(n) on the host
    is_gap = (np.abs(np.asarray(signal)) < threshold).astype(np.int8)
    if is_gap.size == 0:
        return []
    diff = np.diff(is_gap)
    starts = np.flatnonzero(diff == 1) + 1
    ends = np.flatnonzero(diff == -1) + 1
    if is_gap[0]:
        starts = np.insert(starts, 0, 0)
    if is_gap[-1]:
        ends = np.append(ends, len(is_gap))
    return [(int(s), int(e)) for s, e in zip(starts, ends) if (e - s) > min_len]


import functools


@functools.partial(jax.jit, static_argnums=(1, 2))
def _silent_fraction_per_column(is_gap: jax.Array, n_frames: int, hop: int) -> jax.Array:
    n = is_gap.shape[0]
    centers = jnp.arange(n_frames) * hop
    w0 = jnp.maximum(0, centers - hop // 2)
    w1 = jnp.minimum(n, centers + hop // 2)
    # windowed means via prefix sums: O(n) instead of per-column slicing
    csum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(is_gap.astype(jnp.float32))])
    counts = csum[w1] - csum[w0]
    widths = jnp.maximum(w1 - w0, 1).astype(jnp.float32)
    return counts / widths


def silent_frame_columns(signal, n_frames: int, hop: int,
                         threshold: float = 1e-4,
                         silent_fraction: float = 0.9) -> np.ndarray:
    """Indices of STFT columns whose hop-window around the frame center is
    more than ``silent_fraction`` sub-threshold samples.

    Matches reference main4_NMF_gap.py:28-40 (threshold 1e-4, fraction 0.9)
    and main4_NMF_mask.py:28-45 (threshold 0.01, fraction 0.8). The naive
    per-column window loop is replaced with a prefix-sum windowed mean, one
    fused kernel on device.
    """
    is_gap = silence_mask(jnp.asarray(signal, jnp.float32), threshold)
    frac = _silent_fraction_per_column(is_gap, n_frames, hop)
    return np.flatnonzero(np.asarray(jax.device_get(frac)) > silent_fraction)


def mask_to_bad_columns(sample_mask, n_frames: int, hop: int) -> np.ndarray:
    """Explicit-gap column mapping: scan a per-sample validity mask
    (1/True = valid) as a 0/1 pseudo-signal through the SAME hop-window
    silent-fraction criterion the blind path uses — a column is bad when
    >= 80% of its window covers damaged samples. The ONE definition of
    this mapping, shared by the `api.restore` facade, the windowed batch
    path and the diffusion codec so the 0.5/0.8 criterion can never drift
    between them. Returns bool (n_frames,), True = bad."""
    bad = np.zeros(n_frames, bool)
    bad[silent_frame_columns(np.asarray(sample_mask, np.float32), n_frames,
                             hop, threshold=0.5, silent_fraction=0.8)] = True
    return bad

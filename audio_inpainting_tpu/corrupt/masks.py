"""L2 corruption: seeded mask generators matching the reference distributions.

Unlike the reference (unseeded np.random — SURVEY.md §4.3), every generator
here threads an explicit jax.random key, making corruption reproducible and
therefore assertable in golden tests.

Mask convention throughout: True/1 = sample kept, False/0 = lost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _stamp_intervals(starts: jax.Array, ends: jax.Array, n: int) -> jax.Array:
    """Rasterize union of [start, end) intervals into a bool[n] via +1/-1
    scatter + cumsum — O(n), no data-dependent loops, jit-friendly."""
    delta = jnp.zeros(n + 1, dtype=jnp.int32)
    delta = delta.at[starts].add(1).at[ends].add(-1)
    return jnp.cumsum(delta[:-1]) > 0


def random_dropout_mask(key: jax.Array, n_samples: int, mask_ratio: float = 0.25,
                        min_gap_len: int = 50, max_gap_len: int = 400) -> jax.Array:
    """Random short time-domain dropouts (Part 1 corruption).

    Distribution matches reference generate_part1_data.py:26-35:
    num_gaps = n*ratio/max_len*2 gaps, each uniform length in
    [min_gap_len, max_gap_len) at a uniform start. Implemented without a
    Python data-dependent loop: all gap (start, len) pairs are drawn at once
    and rasterized with a vectorized range-stamp (cumulative comparison),
    so the whole generator jits to one fused kernel.
    """
    num_gaps = int(n_samples * mask_ratio / max_gap_len * 2)
    k1, k2 = jax.random.split(key)
    lens = jax.random.randint(k1, (num_gaps,), min_gap_len, max_gap_len)
    starts = jax.random.randint(k2, (num_gaps,), 0, n_samples - lens)
    return ~_stamp_intervals(starts, starts + lens, n_samples)


def contiguous_gap_mask(n_samples: int, gap_ratio: float = 0.2,
                        start_frac: float = 0.4) -> tuple[np.ndarray, tuple[int, int]]:
    """Deterministic contiguous gap at 40% of the segment (Part 0).

    Matches reference main1_gp.py:61-71 / main2_AR.py:51-58. Returns
    (bool mask, (gap_start, gap_end)).
    """
    gap_len = int(n_samples * gap_ratio)
    start = int(n_samples * start_frac)
    mask = np.ones(n_samples, dtype=bool)
    mask[start : start + gap_len] = False
    return mask, (start, start + gap_len)


def center_gap_bounds(n_samples: int, sr: int, half_seconds: float = 1.0) -> tuple[int, int]:
    """The Part-2 centered 2-second hole (reference generate_part2_data.py:36-41)."""
    center = n_samples // 2
    half = int(half_seconds * sr)
    return center - half, center + half


def random_frame_mask(key: jax.Array, n_freq: int, n_frames: int,
                      mask_ratio: float = 0.3, min_time_mask: int = 5,
                      max_time_mask: int = 30,
                      min_segments: int = 0) -> jax.Array:
    """SpecAugment-style random STFT-frame dropout (Part-1 U-Net corruption).

    Matches reference main5_UNet_mask.py:111-127: full-band vertical stripes,
    num_segments = time*ratio/max*2, widths uniform in [min, max).
    Returns a float (n_freq, n_frames) mask, 1 = keep.

    min_segments (beyond-reference, default 0 = exact reference semantics):
    floor on the stripe count, for short clips where the reference formula
    truncates to 0 segments and the mask degenerates to all-kept (the
    serving layer needs at least one synthetic hole to train on).
    """
    num_segments = max(min_segments,
                       int(n_frames * mask_ratio / max_time_mask * 2))
    k1, k2 = jax.random.split(key)
    lens = jax.random.randint(k1, (num_segments,), min_time_mask, max_time_mask)
    starts = jax.random.randint(k2, (num_segments,), 0, n_frames - lens)
    lost_cols = _stamp_intervals(starts, starts + lens, n_frames)
    return jnp.broadcast_to((~lost_cols).astype(jnp.float32)[None, :], (n_freq, n_frames))


def training_stripes(key: jax.Array, n_frames: int, intact) -> "np.ndarray":
    """Per-clip synthetic stripe keep-row (1 = keep) for SELF-SUPERVISED
    U-Net training on a blindly-damaged clip.

    Training directly against the detected-damage mask would teach the net
    that holes contain silence — the loss targets there ARE the damaged
    columns. Instead, hide synthetic stripes over the clip's INTACT columns
    (reference main5_UNet_mask.py:111-127 semantics: learn to fill columns
    from context) and keep the real damage out of the loss entirely.

    Widths clamp for short clips with at least one stripe (the reference
    stripe-count formula truncates to 0 under ~50 frames); resamples up to
    8 times if every stripe landed on already-damaged columns, so the clip
    gets >= 1 trainable cell (intact AND synthetically hidden) whenever one
    exists. Shared by the serving layer, the blind `api.restore` U-Net
    branch, and the windowed batch path.
    """
    import numpy as np

    if n_frames < 4:                # too short for stripes: hide one column
        m = np.ones(n_frames, np.float32)
        m[n_frames // 2] = 0.0
        return m
    mt = min(30, max(2, n_frames // 2))      # stripe width in [mn, mt)
    mn = max(1, min(5, mt - 1))
    intact = np.asarray(intact, bool)
    m = None
    for attempt in range(8):
        m = np.asarray(random_frame_mask(
            jax.random.fold_in(key, attempt), 1, n_frames,
            min_time_mask=mn, max_time_mask=mt, min_segments=1))[0]
        if ((m == 0) & intact).any() or not intact.any():
            break
    return m


def frame_gap_mask_2d(n_freq: int, n_frames: int, start_frac: float = 0.4,
                      end_frac: float = 0.6) -> jax.Array:
    """Deterministic 2D STFT gap over frames [40%, 60%) (reference
    main5_UNet_gap.py:98-102). Returns float (n_freq, n_frames), 1 = keep."""
    gap_start = int(n_frames * start_frac)
    gap_end = int(n_frames * end_frac)
    col = jnp.arange(n_frames)
    keep = ~((col >= gap_start) & (col < gap_end))
    return jnp.broadcast_to(keep.astype(jnp.float32)[None, :], (n_freq, n_frames))

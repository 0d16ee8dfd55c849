"""Bidirectional autoregressive inpainting, batched TPU-native.

Reference behavior being matched (see SURVEY.md §2):

- ``main2_AR.py`` — order-30 AR via Ridge(alpha=0.1) on sliding windows,
  recursive one-step extrapolation from both gap edges, linear crossfade.
- ``main3_AR_text*.py`` — Ridge(alpha=0.5) + per-step Gaussian "texture"
  noise with sigma = std of training residuals; order 100 / 5000-sample
  contexts for the 2 s gap (main3_AR_text_gap.py), order 30 / 1000-sample
  contexts for multi-gap (main3_AR_text_mask.py); zero-prediction +
  one-sided-crossfade fallback when a side has an empty training set
  (main3_AR_text_gap.py:102-116 — any non-empty side trains and blends
  normally, so ``ARConfig.min_rows`` defaults to 1).

TPU-native design (not a translation):

- The reference's per-gap, per-direction Python loop with one
  ``model.predict`` call per output sample (88,200 sklearn calls for the 2 s
  gap) becomes ONE ``lax.scan`` whose state is a (B, order) matrix over the
  batch B = [all gaps] x [fwd, bwd]. Fit is batched normal equations
  (Ridge with intercept, masked rows) solved with Cholesky on the MXU.
- Texture noise is pre-drawn from a threaded PRNG key (the reference is
  unseeded np.random — SURVEY.md §4.3 — so per-sample values can't and
  needn't match; the distribution does).
- Known reference quirk preserved: recursion starts from the *second-to-last*
  training window (``context_X[-1]`` = samples [len-order-1, len-1)), so the
  first prediction targets the last observed sample, not the first gap
  sample (main2_AR.py:65, main3_AR_text_gap.py:62).

Multi-gap mode restores every gap in parallel; ``passes>1`` re-runs the
batch with the previous pass's output as context, which supersedes the
reference's left-to-right progressive-context scheme
(main3_AR_text_mask.py:71-103) symmetrically.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ARConfig:
    order: int = 100
    alpha: float = 0.5
    texture: bool = True
    # Chunked companion-matrix extrapolation: advance the recurrence
    # ``chunk`` samples per scan step as three matmuls (see
    # _extrapolate_chunked) instead of one dot per sample. 0 = off
    # (sequential scan / Pallas VMEM kernel). Requires chunk >= order.
    chunk: int = 0
    # Multiplier on the residual-sigma texture noise. 1.0 = reference
    # behavior (main3_AR_text.py:74 injects N(0, noise_std)); values < 1
    # trade some of the texture's spectral-energy fill (LSD win) for less
    # uncorrelated noise energy (global SNR win).
    texture_scale: float = 1.0
    context_len: int = 5000
    passes: int = 1
    # A side is "valid" when it has >= min_rows training windows; invalid
    # sides get a zero prediction and the crossfade goes fully one-sided.
    # The reference's criterion is len(X) == 0 (main3_AR_text_gap.py:115-116,
    # main3_AR_text_mask.py:99), i.e. min_rows = 1; larger values are an
    # optional stricter guard beyond reference behavior.
    min_rows: int = 1
    # Shape bucketing: pad the gap batch to the bucket_gap_count ladder
    # (8, 32, 128, ... — with zero-length dummy gaps that fit garbage
    # models but paste nothing) and
    # round the extrapolation length up to a power of two >= 1024, so the
    # set of compiled XLA programs over arbitrary damage is LOGARITHMIC
    # instead of one per distinct (gap count, max gap length). Off by
    # default — the official bench paths compile exact shapes; the
    # windowed/streaming engines turn it on (their design is compile-once
    # reuse across windows, and a live stream cannot afford a fresh compile
    # per novel gap length). Bucketing changes the texture-noise draw
    # SHAPES, so bucketed fills differ sample-wise from unbucketed ones
    # (same distribution, same seeds-for-same-shapes determinism).
    bucket: bool = False


_GAP_PAD_FLOOR = 8      # bucketed gap-batch sizes: 8, 32, 128, ... (x4)
_LEN_FLOOR = 1024       # bucketed extrapolation lengths: 1024, 2048, ...


def bucket_gap_count(n_gaps: int) -> int:
    """Bucketed gap-batch size: 8, then powers of FOUR (32, 128, ...).

    Coarse jumps on purpose: real music carries 13-14 natural sub-0.01
    quiet runs per 2 s window (measured on the reference clip), so
    power-of-two buckets would hop 8 -> 16 -> 32 with the count drifting
    across window positions — every hop is a fresh XLA program. A x4
    ladder lands all of 9..32 runs in ONE bucket; padding rows are cheap
    (each is one extra Hankel fit + scan lane on the MXU)."""
    b = _GAP_PAD_FLOOR
    while b < n_gaps:
        b *= 4
    return b


def bucket_max_len(max_len: int) -> int:
    """Bucketed extrapolation length: power of two >= max(max_len, 1024)."""
    return max(_LEN_FLOOR, 1 << (max(1, max_len) - 1).bit_length())


def _hankel_indices(context_len: int, order: int) -> np.ndarray:
    rows = context_len - order
    return np.arange(rows)[:, None] + np.arange(order + 1)[None, :]


@functools.partial(jax.jit, static_argnames=("cfg",))
def _fit_ridge_batched(ctxs: jax.Array, pad_lens: jax.Array, cfg: ARConfig):
    """Batched Ridge-with-intercept fit on sliding windows.

    ctxs: (B, C) contexts with time flowing toward the gap, front-padded.
    pad_lens: (B,) number of invalid leading samples per context.
    Returns (w (B, order), b (B,), noise_std (B,), valid (B,)).
    """
    B, C = ctxs.shape
    order = cfg.order
    idx = jnp.asarray(_hankel_indices(C, order))
    windows = ctxs[:, idx]               # (B, R, order+1)
    X = windows[:, :, :order]            # (B, R, order)
    y = windows[:, :, order]             # (B, R)
    R = X.shape[1]
    rows = jnp.arange(R)
    m = (rows[None, :] >= pad_lens[:, None]).astype(jnp.float32)  # (B, R)

    n = jnp.maximum(jnp.sum(m, axis=1), 1.0)                      # (B,)
    mean_x = jnp.einsum("br,bro->bo", m, X) / n[:, None]
    mean_y = jnp.sum(m * y, axis=1) / n
    Xc = (X - mean_x[:, None, :]) * m[:, :, None]
    yc = (y - mean_y[:, None]) * m

    A = jnp.einsum("bro,brp->bop", Xc, Xc,
                   precision=jax.lax.Precision.HIGH)
    A = A + cfg.alpha * jnp.eye(order, dtype=A.dtype)[None]
    rhs = jnp.einsum("bro,br->bo", Xc, yc, precision=jax.lax.Precision.HIGH)
    w = jax.scipy.linalg.cho_solve(
        (jax.scipy.linalg.cholesky(A, lower=True), True), rhs[..., None]
    )[..., 0]
    b = mean_y - jnp.einsum("bo,bo->b", mean_x, w)

    pred = jnp.einsum("bro,bo->br", X, w) + b[:, None]
    resid = (y - pred) * m
    # np.std over the valid rows (population std, ddof=0 — reference
    # main3_AR_text_gap.py:58-60 computes np.std of all residuals)
    mean_r = jnp.sum(resid, axis=1) / n
    noise_std = jnp.sqrt(jnp.maximum(
        jnp.sum(m * (resid - mean_r[:, None] * m) ** 2, axis=1) / n, 0.0))

    valid = jnp.sum(m, axis=1) >= cfg.min_rows
    return w, b, noise_std, valid


@functools.partial(jax.jit, static_argnames=("steps", "texture"))
def _extrapolate_scan(ctxs: jax.Array, w: jax.Array, b: jax.Array,
                      noise_std: jax.Array, valid: jax.Array, key: jax.Array,
                      steps: int, texture: bool) -> jax.Array:
    """Recursive AR extrapolation as one scan over the whole batch.

    Returns (B, steps) predictions (zeros for invalid models).
    """
    B, C = ctxs.shape
    order = w.shape[1]
    # Reference quirk: start from context_X[-1] = samples [C-order-1, C-1)
    state0 = ctxs[:, C - order - 1 : C - 1]
    eps = (jax.random.normal(key, (steps, B)) if texture
           else jnp.zeros((steps, B)))
    gain = jnp.where(valid, 1.0, 0.0)

    def step(state, e):
        pred = jnp.einsum("bo,bo->b", state, w) + b
        pred = (pred + noise_std * e) * gain
        state = jnp.concatenate([state[:, 1:], pred[:, None]], axis=1)
        return state, pred

    _, preds = jax.lax.scan(step, state0, eps)
    return preds.T  # (B, steps)


@functools.partial(jax.jit, static_argnames=("steps", "texture", "chunk"))
def _extrapolate_chunked(ctxs: jax.Array, w: jax.Array, b: jax.Array,
                         noise_std: jax.Array, valid: jax.Array,
                         key: jax.Array, steps: int, texture: bool,
                         chunk: int) -> jax.Array:
    """Companion-matrix chunked AR extrapolation: k samples per scan step.

    The per-sample recurrence x_t = w . s_t + b + sigma e_t is linear, so a
    whole chunk of k outputs is an affine map of the entry state and the
    chunk's noise draws:

        x[0:k] = M s0  +  b q  +  sigma (L e[0:k])
        s'     = x[k-order:k]                      (k >= order)

    with M (k, order) the state impulse response, c the scalar impulse
    response (c_0 = 1, c_m = w . c_{m-order..m-1}), q = cumsum(c), and L the
    lower-triangular Toeplitz matrix of c. M, c are precomputed once with
    two k-step scans; the main scan then runs ceil(steps/k) iterations of
    three (k x order)/(k x k) matmuls on the MXU instead of ``steps``
    scalar dot products — ~k-fold less sequential depth than the
    per-sample form (reference main3_AR_text_gap.py:62-73 is one sklearn
    predict() per sample). Same key/shape noise draw as _extrapolate_scan,
    so per-sample noise matches the sequential path exactly.
    """
    B, C = ctxs.shape
    p = w.shape[1]
    k = chunk
    assert k >= p, (k, p)
    state0 = ctxs[:, C - p - 1 : C - 1]

    # scalar impulse response c (B, k): response of x_{m} to e_0
    def c_step(z, _):
        cm = jnp.einsum("bo,bo->b", z, w)
        return jnp.concatenate([z[:, 1:], cm[:, None]], axis=1), cm

    z0 = jnp.zeros((B, p)).at[:, -1].set(1.0)
    _, c_tail = jax.lax.scan(c_step, z0, None, length=k - 1)
    c = jnp.concatenate([jnp.ones((1, B)), c_tail], axis=0).T    # (B, k)

    # state response M (B, k, p): x_j = M[j] . s0 for the noiseless b=0 run
    def m_step(S, _):
        m = jnp.einsum("bo,bop->bp", w, S)
        return jnp.concatenate([S[:, 1:, :], m[:, None, :]], axis=1), m

    S0 = jnp.broadcast_to(jnp.eye(p, dtype=w.dtype), (B, p, p))
    _, M = jax.lax.scan(m_step, S0, None, length=k)              # (k, B, p)
    M = jnp.transpose(M, (1, 0, 2))                              # (B, k, p)

    q = jnp.cumsum(c, axis=1)                                    # (B, k)
    ii = jnp.arange(k)[:, None]
    jj = jnp.arange(k)[None, :]
    L = jnp.where(ii >= jj, c[:, jnp.where(ii >= jj, ii - jj, 0)], 0.0)

    nchunks = -(-steps // k)
    total = nchunks * k
    eps = (jax.random.normal(key, (steps, B)) if texture
           else jnp.zeros((steps, B)))
    eps = jnp.pad(eps, ((0, total - steps), (0, 0)))
    eps = jnp.transpose(eps.reshape(nchunks, k, B), (0, 2, 1))   # (n, B, k)
    gain = jnp.where(valid, 1.0, 0.0)

    def chunk_step(s, e):
        x = (jnp.einsum("bkp,bp->bk", M, s,
                        precision=jax.lax.Precision.HIGH)
             + b[:, None] * q
             + noise_std[:, None] * jnp.einsum(
                 "bkj,bj->bk", L, e, precision=jax.lax.Precision.HIGH))
        x = x * gain[:, None]
        return x[:, k - p:], x

    _, xs = jax.lax.scan(chunk_step, state0, eps)                # (n, B, k)
    return jnp.transpose(xs, (1, 0, 2)).reshape(B, total)[:, :steps]


@functools.partial(jax.jit, static_argnames=("context_len",))
def _extract_contexts(signal: jax.Array, starts: jax.Array, ends: jax.Array,
                      context_len: int):
    """Gather (2G, C) contexts: rows [0,G) forward (left side, natural order),
    rows [G,2G) backward (right side, reversed). Front-padded with zeros
    where the clip boundary truncates the context; pad lengths returned."""
    n = signal.shape[0]
    C = context_len
    padded = jnp.pad(signal, (C, C))
    offs = jnp.arange(C)
    # fwd: original [start-C, start)  -> padded [start, start+C)
    fwd = padded[starts[:, None] + offs[None, :]]
    fwd_pad = jnp.maximum(0, C - starts)
    # bwd: original [end, end+C) reversed -> padded [end+2C-1 .. end+C]
    bwd = padded[ends[:, None] + (2 * C - 1) - offs[None, :]]
    bwd_pad = jnp.maximum(0, ends + C - n)
    return (jnp.concatenate([fwd, bwd], axis=0),
            jnp.concatenate([fwd_pad, bwd_pad], axis=0))


@functools.partial(jax.jit, static_argnames=("max_len",))
def _blend_and_paste(signal: jax.Array, starts: jax.Array, lens: jax.Array,
                     fwd: jax.Array, bwd: jax.Array, fwd_valid: jax.Array,
                     bwd_valid: jax.Array, max_len: int) -> jax.Array:
    """Crossfade fwd/bwd predictions per gap and scatter into the signal.

    weights = linspace(1, 0, L) (all-ones / all-zeros when one side is
    invalid — reference main3_AR_text_gap.py:113-118).
    """
    n = signal.shape[0]
    t = jnp.arange(max_len)[None, :]                     # (1, S)
    L = lens[:, None]                                    # (G, 1)
    in_gap = t < L
    # reversed-in-gap backward prediction: bwd_rev[g, t] = bwd[g, L-1-t]
    rev_idx = jnp.clip(L - 1 - t, 0, max_len - 1)
    bwd_rev = jnp.take_along_axis(bwd, rev_idx, axis=1)

    wts = jnp.where(L > 1, 1.0 - t / jnp.maximum(L - 1, 1), 1.0)
    wts = jnp.where(fwd_valid[:, None], wts, 0.0)
    wts = jnp.where(bwd_valid[:, None], wts, 1.0)
    fill = fwd * wts + bwd_rev * (1.0 - wts)

    pos = jnp.where(in_gap, starts[:, None] + t, n)       # OOB -> dropped
    return signal.at[pos.reshape(-1)].set(fill.reshape(-1), mode="drop")


@functools.partial(jax.jit,
                   static_argnames=("cfg", "max_len", "use_pallas", "n_gaps"))
def _restore_once_fused(signal: jax.Array, starts: jax.Array,
                        ends: jax.Array, key: jax.Array, cfg: ARConfig,
                        max_len: int, use_pallas: bool, n_gaps: int):
    """Extract + fit + extrapolate + blend as ONE device program.

    Fusing the four stages under a single jit removes the per-stage host
    dispatch that dominated part-1 AR in round 1 (measured 5.4 s lap vs
    ~0.1 s device compute, NOTES_ROUND2.md)."""
    from ..ops.pallas.ar_scan import ar_extrapolate_pallas

    lens = ends - starts
    ctxs, pads = _extract_contexts(signal, starts, ends, cfg.context_len)
    w, b, std, valid = _fit_ridge_batched(ctxs, pads, cfg)
    std = std * cfg.texture_scale
    if cfg.chunk > 0:
        if cfg.chunk < cfg.order:
            raise ValueError(
                f"ARConfig.chunk={cfg.chunk} must be >= order={cfg.order} "
                "(the chunk's tail is the next chunk's entry state)")
        preds = _extrapolate_chunked(ctxs, w, b, std, valid, key, max_len,
                                     cfg.texture, cfg.chunk)
    elif use_pallas:
        B, C = ctxs.shape
        order = cfg.order
        state0 = ctxs[:, C - order - 1 : C - 1]
        eps = (jax.random.normal(key, (max_len, B)).T if cfg.texture
               else jnp.zeros((B, max_len)))
        gain = jnp.where(valid, 1.0, 0.0)
        preds = ar_extrapolate_pallas(state0, w, b, std, gain, eps, max_len)
    else:
        preds = _extrapolate_scan(ctxs, w, b, std, valid, key, max_len,
                                  cfg.texture)
    G = n_gaps
    out = _blend_and_paste(signal, starts, lens, preds[:G], preds[G:],
                           valid[:G], valid[G:], max_len)
    return out, preds


def _restore_once(signal: jax.Array, starts: np.ndarray, ends: np.ndarray,
                  cfg: ARConfig, key: jax.Array):
    from ..ops.pallas.ar_scan import pallas_supported

    max_len = int(np.max(ends - starts))
    if cfg.bucket:
        max_len = bucket_max_len(max_len)
    use_pallas = bool(pallas_supported()) and cfg.order <= 128
    return _restore_once_fused(signal, jnp.asarray(starts), jnp.asarray(ends),
                               key, cfg, max_len, use_pallas, len(starts))


def ar_restore_gaps(signal, gaps: list[tuple[int, int]], cfg: ARConfig,
                    key: jax.Array | int = 0) -> jax.Array:
    """Restore all gaps (list of (start, end)) bidirectionally, in parallel.

    ``cfg.passes > 1`` repeats the whole batch using the previous output as
    training context (symmetric generalization of the reference's
    progressive left-to-right context reuse, main3_AR_text_mask.py:74-101).
    """
    if not gaps:
        return jnp.asarray(signal, jnp.float32)
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    signal = jnp.asarray(signal, jnp.float32)
    starts = np.array([s for s, _ in gaps], dtype=np.int32)
    ends = np.array([e for _, e in gaps], dtype=np.int32)
    if cfg.bucket:
        # zero-length dummy gaps: their models fit on whatever sits at the
        # window start, but in_gap is empty so they paste nothing
        pad = bucket_gap_count(len(gaps)) - len(gaps)
        starts = np.pad(starts, (0, pad))
        ends = np.pad(ends, (0, pad))
    out = signal
    for p in range(cfg.passes):
        out, _ = _restore_once(out, starts, ends, cfg, jax.random.fold_in(key, p))
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "max_len", "n_gaps"))
def _restore_windows_fused(signals, starts, ends, key, cfg: ARConfig,
                           max_len: int, n_gaps: int):
    """One pass over a batch of same-size windows: vmap of the fused
    single-window program. ``key`` is closed over (NOT vmapped), so every
    window draws the texture noise the sequential per-window path draws
    with the same seed — batched == sequential."""
    def one(sig, st, en):
        out, _ = _restore_once_fused(sig, st, en, key, cfg, max_len,
                                     False, n_gaps)
        return out

    return jax.vmap(one)(signals, starts, ends)


def ar_restore_gaps_windows(signals, gaps_list, cfg: ARConfig,
                            key: jax.Array | int = 0) -> jax.Array:
    """Restore gaps in a BATCH of equal-length windows as ONE fused program.

    The windowed/streaming engines' AR lift (the U-Net already batches via
    parallel/batch.py): a long file's many same-size damage windows restore
    in ~the cost of one dispatch instead of one `api.restore` entry per
    window. signals: (W, n) float32 windows; gaps_list: per-window
    window-local [(s, e)] spans (every window's list non-empty).

    Shape bucketing is forced on, and all windows must land in the SAME
    (gap-count, max-len) bucket — callers group windows by
    (size, bucket_gap_count, bucket_max_len) first (methods/windowed.py).
    Every window uses the same ``key`` the sequential path
    (api.restore(..., seed=seed) per window) uses, so batched ==
    sequential-with-bucketing per window; tests pin it
    (tests/test_windowed.py).
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    cfg, starts, ends, gpad, max_len = windows_prep(gaps_list, cfg)
    out = jnp.asarray(signals, jnp.float32)
    for p in range(cfg.passes):
        out = _restore_windows_fused(out, jnp.asarray(starts),
                                     jnp.asarray(ends),
                                     jax.random.fold_in(key, p), cfg,
                                     max_len, gpad)
    return out


def windows_prep(gaps_list, cfg: ARConfig):
    """Shared prep for the batched window engines (meshless and the
    parallel/engines.py dp-sharded mode): validate the single-bucket
    contract and build the padded (W, gpad) start/end arrays. Returns
    (cfg with bucket forced on, starts, ends, gpad, max_len)."""
    import dataclasses

    if any(not g for g in gaps_list):
        raise ValueError("every window must have at least one gap")
    cfg = dataclasses.replace(cfg, bucket=True)
    gpads = {bucket_gap_count(len(g)) for g in gaps_list}
    lens = {bucket_max_len(max(e - s for s, e in g)) for g in gaps_list}
    if len(gpads) != 1 or len(lens) != 1:
        raise ValueError(
            f"windows span multiple shape buckets (gap counts {gpads}, "
            f"max lens {lens}); group by bucket first")
    gpad, max_len = gpads.pop(), lens.pop()
    W = len(gaps_list)
    starts = np.zeros((W, gpad), np.int32)
    ends = np.zeros((W, gpad), np.int32)
    for i, g in enumerate(gaps_list):
        starts[i, :len(g)] = [s for s, _ in g]
        ends[i, :len(g)] = [e for _, e in g]
    return cfg, starts, ends, gpad, max_len


def ar_restore_gap(signal, gap: tuple[int, int], cfg: ARConfig,
                   key: jax.Array | int = 0) -> jax.Array:
    """Single-gap restoration (Part 0 / Part 2)."""
    return ar_restore_gaps(signal, [gap], cfg, key)


def ar_restore_gap_detailed(signal, gap: tuple[int, int], cfg: ARConfig,
                            key: jax.Array | int = 0):
    """Single-gap restoration also returning (pred_fwd, pred_bwd_reversed)
    for the reference's fwd/bwd overlay visualization (main2_AR.py:134-152)."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    signal = jnp.asarray(signal, jnp.float32)
    s, e = gap
    out, preds = _restore_once(
        signal, np.array([s], np.int32), np.array([e], np.int32), cfg,
        jax.random.fold_in(key, 0))
    L = e - s
    fwd = preds[0, :L]
    bwd = preds[1, :L][::-1]
    return out, np.asarray(fwd), np.asarray(bwd)

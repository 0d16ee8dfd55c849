"""Masked NMF spectrogram inpainting, TPU-native.

Reference behavior (SURVEY.md §2):

- one-shot (Part 1/2): seed damaged STFT columns with the mean spectrum of
  the good columns, fit NMF(n_components=40, init='random', max_iter=200)
  once, overwrite damaged columns with W@H
  (main4_NMF_gap.py:56-68, main4_NMF_mask.py:62-73).
- iterative (Part 0): seed gap columns with the mean spectrum of the
  *pre-gap* region, then 50 outer iterations of {refit NMF from the same
  random init, overwrite gap columns} (main4_NMF.py:79-90).

TPU-native design: sklearn's coordinate-descent solver is replaced with
Lee-Seung multiplicative updates (Frobenius loss) — two dense matmul pairs
per iteration, all on the MXU, in one jitted ``lax.fori_loop``. Bitwise W/H
parity with sklearn CD is not a goal (SURVEY.md §7 "hard parts"); the parity
target is reconstruction quality. Init matches sklearn's 'random' scheme:
|N(0,1)| * sqrt(mean(V)/k), seeded via jax.random.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

_EPS = 1e-10
_PREC = jax.lax.Precision.HIGH


@dataclass(frozen=True)
class NMFConfig:
    n_components: int = 40
    n_iter: int = 200       # inner multiplicative-update iterations per fit
    outer_iters: int = 1    # refit-and-overwrite cycles (Part 0 uses 50)


def _init_wh(key: jax.Array, v_mean: jax.Array, shape_v: tuple[int, int],
             k: int) -> tuple[jax.Array, jax.Array]:
    f, t = shape_v
    scale = jnp.sqrt(jnp.maximum(v_mean, _EPS) / k)
    kw, kh = jax.random.split(key)
    w = jnp.abs(jax.random.normal(kw, (f, k))) * scale
    h = jnp.abs(jax.random.normal(kh, (k, t))) * scale
    return w, h


def _mu_fit(v: jax.Array, w0: jax.Array, h0: jax.Array, n_iter: int):
    """Frobenius multiplicative updates; one fori_loop, all matmuls MXU."""

    def body(_, wh):
        w, h = wh
        wt_v = jnp.einsum("fk,ft->kt", w, v, precision=_PREC)
        wt_wh = jnp.einsum("fk,fj,jt->kt", w, w, h, precision=_PREC)
        h = h * wt_v / (wt_wh + _EPS)
        v_ht = jnp.einsum("ft,kt->fk", v, h, precision=_PREC)
        w_hht = jnp.einsum("fj,jt,kt->fk", w, h, h, precision=_PREC)
        w = w * v_ht / (w_hht + _EPS)
        return w, h

    return jax.lax.fori_loop(0, n_iter, body, (w0, h0))


@functools.partial(jax.jit, static_argnames=("cfg",))
def nmf_reconstruct(v: jax.Array, cfg: NMFConfig, key: jax.Array) -> jax.Array:
    """Fit NMF to a nonnegative matrix and return the low-rank model W@H."""
    w0, h0 = _init_wh(key, jnp.mean(v), v.shape, cfg.n_components)
    w, h = _mu_fit(v, w0, h0, cfg.n_iter)
    return jnp.einsum("fk,kt->ft", w, h, precision=_PREC)


@functools.partial(jax.jit, static_argnames=("cfg",))
def nmf_inpaint_columns(mag: jax.Array, bad_cols: jax.Array, cfg: NMFConfig,
                        key: jax.Array) -> jax.Array:
    """One-shot masked inpainting of STFT-magnitude columns.

    mag: (n_bins, n_frames) nonnegative; bad_cols: bool (n_frames,).
    Matches the reference one-shot scheme: seed bad columns with the mean
    good-column spectrum, fit once, overwrite bad columns only.
    """
    bad = bad_cols[None, :]
    good_f = (~bad_cols).astype(mag.dtype)[None, :]
    avg_spec = jnp.sum(mag * good_f, axis=1, keepdims=True) / jnp.maximum(
        jnp.sum(good_f), 1.0)
    seeded = jnp.where(bad, avg_spec, mag)
    v_hat = nmf_reconstruct(seeded, cfg, key)
    return jnp.where(bad, v_hat, mag)


@functools.partial(jax.jit, static_argnames=("cfg", "col_start", "col_end"))
def nmf_inpaint_iterative(mag: jax.Array, col_start: int, col_end: int,
                          cfg: NMFConfig, key: jax.Array) -> jax.Array:
    """Part-0 iterative scheme: seed gap columns with the mean *pre-gap*
    spectrum, then ``outer_iters`` x {fit from the same init, overwrite gap
    columns} (reference main4_NMF.py:79-90, which reuses one sklearn model
    object whose fixed random_state re-seeds identically every refit)."""
    cols = jnp.arange(mag.shape[1])
    bad = ((cols >= col_start) & (cols < col_end))[None, :]
    avg_spec = jnp.mean(mag[:, :col_start], axis=1, keepdims=True)
    current = jnp.where(bad, avg_spec, mag)
    # sklearn with fixed random_state draws the SAME |N(0,1)| values every
    # refit but rescales them by sqrt(mean(V)/k) of the CURRENT matrix
    # (sklearn.decomposition._nmf._initialize_nmf); draw once, rescale per
    # outer iteration.
    k = cfg.n_components
    kw, kh = jax.random.split(key)
    w_raw = jnp.abs(jax.random.normal(kw, (mag.shape[0], k)))
    h_raw = jnp.abs(jax.random.normal(kh, (k, mag.shape[1])))

    def outer(_, cur):
        scale = jnp.sqrt(jnp.maximum(jnp.mean(cur), _EPS) / k)
        w, h = _mu_fit(cur, w_raw * scale, h_raw * scale, cfg.n_iter)
        v_hat = jnp.einsum("fk,kt->ft", w, h, precision=_PREC)
        return jnp.where(bad, v_hat, cur)

    return jax.lax.fori_loop(0, cfg.outer_iters, outer, current)

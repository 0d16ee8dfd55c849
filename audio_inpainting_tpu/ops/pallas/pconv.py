"""Pallas TPU kernels for the W-packed 3x3 conv (ops.packedconv layout).

The XLA band-conv path (ops.packedconv._conv_packed) materializes the band
gather in HBM: an H-padded copy, then a lane-concat to (B+2)/B the size,
then three shifted full reads — ~7x the activation bytes per conv against a
2x floor (read x, write y). Device traces put these gathers + their
elementwise neighbors at most of the GAN epoch (19.2 ms measured, round 3).

These kernels keep the gather in VMEM: the grid tiles H; each program loads
its row tile plus one halo row on each side, builds the three kh row views
and the two neighbor-column edge contributions on-chip, and runs the band
contraction as MXU matmuls straight from VMEM — x is read once from HBM and
y written once. The backward runs the same kernel with the flipped/
transposed band kernel for dx, and a revisited-output accumulation kernel
for the weight gradient (f32, matching the XLA path's mixed precision).

Numerics match ops.packedconv.conv3x3_packed exactly in op order: the
equivalence tests run these kernels in interpret mode on CPU; the packed
models dispatch to them automatically on TPU (conv3x3_packed_auto).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..packedconv import B, _band_kernel


_TH = 16  # tile rows: ~0.9 MB/tile at the GAN's 55 KB packed row, well
# under the 16 MB scoped-VMEM limit with double buffering + f32 accumulators
# (TH=43 measured 16.3 MB — over). Partial last tiles are handled by an
# in-kernel row mask, so TH need not divide H.


def _row_mask(i, th, h, shape):
    """1.0 where the global row (i*th - 1 + local) is inside [0, h)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + i * th - 1
    return jnp.logical_and(rows >= 0, rows < h)


def _dot(a, b):
    """Contract a's lane dim with b's first dim, f32 accumulate on the MXU."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _col_masks(th: int, wb: int, lo: int):
    """(not-first-column, not-last-column) masks over (th, wb, lo)."""
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (th, wb, lo), 1)
    return w_ids > 0, w_ids < wb - 1


def _fwd_kernel(xt_ref, xc_ref, xb_ref, kl_ref, kc_ref, kr_ref, out_ref,
                *, h: int):
    """Band conv tile: y[w] = sum_kh xk[w] @ KC + xk[w-1] @ KL + xk[w+1] @ KR.

    The column shifts run AFTER the matmul via a sublane roll + edge mask —
    every MXU operand keeps the full (th, wb, l) tile shape (Mosaic rejects
    odd-width lane-sliced operands). Rows outside [0, h) (the SAME zero pad
    and the last partial tile's overhang) are masked to zero."""
    i = pl.program_id(0)
    th, wb, l = xc_ref.shape
    lo = kc_ref.shape[2]
    xfull = jnp.concatenate([xt_ref[:], xc_ref[:], xb_ref[:]], axis=0)
    xfull = jnp.where(_row_mask(i, th, h, xfull.shape), xfull, 0)
    not_first, not_last = _col_masks(th, wb, lo)
    acc = jnp.zeros((th, wb, lo), jnp.float32)
    for kh in range(3):
        xk = xfull[kh:kh + th]
        acc += _dot(xk, kc_ref[kh])
        left = _dot(xk, kl_ref[kh])     # col w feeds col w+1
        acc += jnp.where(not_first, pltpu.roll(left, shift=1, axis=1), 0.0)
        right = _dot(xk, kr_ref[kh])    # col w feeds col w-1
        acc += jnp.where(not_last, pltpu.roll(right, shift=wb - 1, axis=1), 0.0)
    out_ref[:] = acc.astype(out_ref.dtype)


def _dk_kernel(xt_ref, xc_ref, xb_ref, g_ref, dkb_ref, *, ci: int, h: int):
    """Banded weight grad tile: dkb core rows = sum xk^T g; the edge rows
    contract against the column-shifted g (roll + mask, full-tile operands)
    and slice the needed Ci rows out of the full (l, lo) product."""
    i = pl.program_id(0)
    th, wb, l = xc_ref.shape
    lo = g_ref.shape[2]

    @pl.when(i == 0)
    def _():
        dkb_ref[:] = jnp.zeros_like(dkb_ref)

    xfull = jnp.concatenate([xt_ref[:], xc_ref[:], xb_ref[:]], axis=0)
    xfull = jnp.where(_row_mask(i, th, h, xfull.shape), xfull, 0)
    g_rows = jax.lax.broadcasted_iota(jnp.int32, g_ref.shape, 0) + i * th
    g = jnp.where(g_rows < h, g_ref[:], 0)
    not_first, not_last = _col_masks(th, wb, lo)
    # Mosaic only rotates 32-bit data: roll in f32 and cast back (exact)
    g32 = g.astype(jnp.float32)
    g_next = jnp.where(not_last, pltpu.roll(g32, shift=wb - 1, axis=1),
                       0.0).astype(g.dtype)
    g_prev = jnp.where(not_first, pltpu.roll(g32, shift=1, axis=1),
                       0.0).astype(g.dtype)

    gf = g.reshape(th * wb, lo)
    gnf = g_next.reshape(th * wb, lo)
    gpf = g_prev.reshape(th * wb, lo)

    def _acc(a, gg):
        # (th*wb, l)^T @ (th*wb, lo) — single contracting dim for tpu.matmul
        return jax.lax.dot_general(
            a.reshape(th * wb, l), gg,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    for kh in range(3):
        xk = xfull[kh:kh + th]
        dkb_ref[kh, ci:ci + l, :] += _acc(xk, gf)
        dkb_ref[kh, :ci, :] += _acc(xk, gnf)[l - ci:, :]
        dkb_ref[kh, ci + l:, :] += _acc(xk, gpf)[:ci, :]


def _row_specs(th: int, h: int, wb: int, l: int):
    """Core tile + one halo row above/below (clamped at the image edges;
    the kernel masks the clamped rows to zero)."""
    return [
        pl.BlockSpec((1, wb, l), lambda i: (jnp.maximum(i * th - 1, 0), 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((th, wb, l), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, wb, l),
                     lambda i: (jnp.minimum((i + 1) * th, h - 1), 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _split_band(kb: jax.Array, ci: int) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(3, (B+2)*Ci, Lo) band -> full-lane column-tap kernels (3, L, Lo):
    KL has the left-edge rows placed at the tail lanes (where the previous
    column's contributing positions live), KR at the head lanes."""
    k3, kk, lo = kb.shape
    l = kk - 2 * ci
    kl = jnp.zeros((3, l, lo), kb.dtype).at[:, l - ci:, :].set(kb[:, :ci, :])
    kc = kb[:, ci:ci + l, :]
    kr = jnp.zeros((3, l, lo), kb.dtype).at[:, :ci, :].set(kb[:, ci + l:, :])
    return kl, kc, kr


@functools.partial(jax.jit, static_argnames=("ci", "interpret"))
def _pconv_fwd3(x3: jax.Array, kb: jax.Array, ci: int,
                interpret: bool = False) -> jax.Array:
    """(H, Wb, B*Ci) x banded (3, (B+2)*Ci, B*Co) -> (H, Wb, B*Co)."""
    h, wb, l = x3.shape
    lo = kb.shape[2]
    th = min(_TH, h)
    kl, kc, kr = _split_band(kb.astype(x3.dtype), ci)
    kspec = pl.BlockSpec((3, l, lo), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, h=h),
        grid=(pl.cdiv(h, th),),
        in_specs=_row_specs(th, h, wb, l) + [kspec, kspec, kspec],
        out_specs=pl.BlockSpec((th, wb, lo), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wb, lo), x3.dtype),
        interpret=interpret,
    )(x3, x3, x3, kl, kc, kr)
    return out


@functools.partial(jax.jit, static_argnames=("ci", "interpret"))
def _pconv_dk3(x3: jax.Array, g3: jax.Array, ci: int,
               interpret: bool = False) -> jax.Array:
    """Banded weight grad: sum over all positions of xb^T g, f32."""
    h, wb, l = x3.shape
    lo = g3.shape[2]
    th = min(_TH, h)
    dkb = pl.pallas_call(
        functools.partial(_dk_kernel, ci=ci, h=h),
        grid=(pl.cdiv(h, th),),
        in_specs=_row_specs(th, h, wb, l)
        + [pl.BlockSpec((th, wb, lo), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((3, l + 2 * ci, lo), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, l + 2 * ci, lo), jnp.float32),
        interpret=interpret,
    )(x3, x3, x3, g3)
    return dkb


def fold_band_grad(dkb: jax.Array, ci: int, co: int) -> jax.Array:
    """(3, (B+2)*Ci, B*Co) banded grad -> (3, 3, Ci, Co): each logical tap
    k[kh, dw] appears at band cell (p=j+dw-? ...) — sum its B occurrences.
    Mirrors ops.packedconv._bwd's fold (band row p = input position p-1)."""
    dk = jnp.zeros((3, 3, ci, co), jnp.float32)
    for kh in range(3):
        for dw in range(3):
            blocks = [dkb[kh, (j + dw) * ci:(j + dw + 1) * ci,
                          j * co:(j + 1) * co] for j in range(B)]
            dk = dk.at[kh, dw].add(sum(blocks))
    return dk


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_packed_pl(xp: jax.Array, k: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Pallas twin of ops.packedconv.conv3x3_packed: 3x3 SAME conv on
    packed activations, (N, H, Wb, B*Ci) -> (N, H, Wb, B*Co).

    k: (3, 3, Ci, Co) f32. Forward in xp's dtype, weight grad f32.

    The batch loops below issue one pallas_call per sample — fine for the
    per-clip trainers (N=1 everywhere in production); a batch grid
    dimension would be needed before using these kernels at N>1 (each call
    carries ~0.3 ms grid/DMA overhead, see packedconv.PCONV_USE_PALLAS)."""
    n, h, wb, bci = xp.shape
    ci = bci // B
    kb = _band_kernel(k)
    ys = [_pconv_fwd3(xp[b], kb, ci, interpret) for b in range(n)]
    return jnp.stack(ys, axis=0)


def _pl_fwd(xp, k, interpret):
    return conv3x3_packed_pl(xp, k, interpret), (xp, k)


def _pl_bwd(interpret, res, g):
    xp, k = res
    n, h, wb, bci = xp.shape
    ci = bci // B
    co = k.shape[3]
    kt = jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2)
    kbt = _band_kernel(kt)
    dxs = [_pconv_fwd3(g[b].astype(xp.dtype), kbt, co, interpret)
           for b in range(n)]
    dx = jnp.stack(dxs, axis=0).astype(xp.dtype)
    dkb = sum(_pconv_dk3(xp[b], g[b], ci, interpret) for b in range(n))
    dk = fold_band_grad(dkb, ci, co)
    return dx, dk.astype(k.dtype)


conv3x3_packed_pl.defvjp(_pl_fwd, _pl_bwd)

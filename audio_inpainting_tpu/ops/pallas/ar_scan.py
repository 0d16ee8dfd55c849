"""Pallas TPU kernel for the AR recursive extrapolation.

The AR hot loop (methods/ar.py) is a strictly sequential recurrence:
    pred_t = (state_t . w + b + std * eps_t) * gain
    state_{t+1} = shift(state_t) <- pred_t
XLA's lax.scan executes it as one while-loop iteration per sample —
~240 ms for the Part-2 shape (2 directions x 88,200 steps) on a v5e,
dominated by per-iteration loop overhead, not math.

This kernel keeps the whole recurrence in VMEM: the batch is tiled 8 rows
per grid step (f32 tile 8x128), the order axis lives in one 128-lane tile
(w zero-padded), and each iteration is a lane-reduce + lane-roll + masked
lane-insert on the VPU. Mosaic cannot address a single dynamic lane, so the
time axis is processed in 128-wide tiles: an outer loop loads one eps tile
and flushes one output tile, an inner 128-step loop extracts/inserts lanes
with masked selects against a lane iota.

Semantics match methods/ar._extrapolate_scan exactly (same op order); the
equivalence test runs the kernel in interpret mode on CPU, and the AR
method uses it automatically on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128  # time tile width == lane count


def pallas_supported() -> bool:
    return jax.default_backend() == "tpu"


def _kernel(w_ref, params_ref, state_ref, eps_ref, out_ref):
    b = params_ref[:, 0:1]
    std = params_ref[:, 1:2]
    gain = params_ref[:, 2:3]
    insert_lane = params_ref[:, 3:4].astype(jnp.int32)
    w = w_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, w.shape, 1)  # (8, 128)
    n_tiles = out_ref.shape[1] // _LANES

    def outer(tile, state):
        base = pl.multiple_of(tile * _LANES, _LANES)
        eps_tile = eps_ref[:, pl.ds(base, _LANES)]

        def inner(col, carry):
            state, acc = carry
            pred = jnp.sum(state * w, axis=1, keepdims=True)       # (8, 1)
            e = jnp.sum(jnp.where(lanes == col, eps_tile, 0.0),
                        axis=1, keepdims=True)
            pred = (pred + b + std * e) * gain
            # left-shift by one lane == roll right by LANES-1 (shift >= 0)
            state = pltpu.roll(state, shift=_LANES - 1, axis=1)
            state = jnp.where(lanes == insert_lane, pred, state)
            acc = jnp.where(lanes == col, pred, acc)
            return state, acc

        state, acc = jax.lax.fori_loop(0, _LANES, inner,
                                       (state, jnp.zeros_like(w)))
        out_ref[:, pl.ds(base, _LANES)] = acc
        return state

    jax.lax.fori_loop(0, n_tiles, outer, state_ref[:])


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def ar_extrapolate_pallas(ctxs_tail: jax.Array, w: jax.Array, b: jax.Array,
                          noise_std: jax.Array, gain: jax.Array,
                          eps: jax.Array, steps: int,
                          interpret: bool = False) -> jax.Array:
    """Run the AR recurrence for ``steps`` outputs.

    ctxs_tail: (B, order) initial state (the reference's second-to-last
    training window, extracted by the caller).
    w: (B, order); b, noise_std, gain: (B,); eps: (B, steps).
    Returns (B, steps) predictions.
    """
    B, order = w.shape
    assert order <= _LANES, "order above 128 needs a multi-tile variant"
    b_pad = (-B) % 8
    s_pad = (-steps) % _LANES

    def pad_rows(x, lanes=None):
        x = jnp.pad(x, ((0, b_pad),) + ((0, 0),) * (x.ndim - 1))
        if lanes is not None and x.shape[-1] < lanes:
            x = jnp.pad(x, ((0, 0), (0, lanes - x.shape[-1])))
        return x

    w_p = pad_rows(w.astype(jnp.float32), _LANES)
    state_p = pad_rows(ctxs_tail.astype(jnp.float32), _LANES)
    params = jnp.stack(
        [b, noise_std, gain, jnp.full((B,), order - 1, jnp.float32)], axis=1)
    params_p = pad_rows(params.astype(jnp.float32), _LANES)
    eps_p = jnp.pad(pad_rows(eps.astype(jnp.float32)), ((0, 0), (0, s_pad)))

    Bp, Sp = B + b_pad, steps + s_pad
    out = pl.pallas_call(
        _kernel,
        grid=(Bp // 8,),
        in_specs=[
            pl.BlockSpec((8, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, Sp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, Sp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, Sp), jnp.float32),
        interpret=interpret,
    )(w_p, params_p, state_p, eps_p)
    return out[:B, :steps]

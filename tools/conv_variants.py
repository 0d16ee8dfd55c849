#!/usr/bin/env python
"""Forward-pass strategies for small-channel 3x3 convs on big spectrograms.

The GAN/U-Net bottleneck (VERDICT r1 weak #4): XLA's conv on (516,1724)
maps badly when C=16..64 — in NHWC the lane dimension holds only C values
(1/8 of a 128-lane register at C=16). Candidates, all pure XLA:

  ref    — lax.conv_general_dilated NHWC (current forward)
  mm9    — sum of 9 shifted (NHW, Ci)@(Ci, Co) matmuls
  wpack  — W-blocked Toeplitz: pack B=8 adjacent time steps into lanes,
           conv becomes 3 matmuls with K=(B+2)Ci, N=B*Co (30% density but
           full lane occupancy)
  nchw   — lax conv with NCHW/OIHW layout

Each is checked against ref numerically, then timed (tunnel-aware: fetch a
scalar per iter, subtract RTT).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16
B = 8


def conv_ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_mm9(x, k):
    n, h, w, ci = x.shape
    co = k.shape[3]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jnp.zeros((n * h * w, co), jnp.float32)
    for kh in range(3):
        for kw in range(3):
            xs = xp[:, kh:kh + h, kw:kw + w, :].reshape(-1, ci)
            y = y + jnp.dot(xs, k[kh, kw].astype(x.dtype),
                            preferred_element_type=jnp.float32)
    return y.reshape(n, h, w, co).astype(x.dtype)


def build_kbig(k, b=B):
    """(3,3,Ci,Co) -> (3, (b+2)*Ci, b*Co) banded Toeplitz blocks."""
    _, _, ci, co = k.shape
    kb = jnp.zeros((3, (b + 2) * ci, b * co), k.dtype)
    for j in range(b):
        for dw in range(3):
            kb = kb.at[:, (j + dw) * ci:(j + dw + 1) * ci,
                       j * co:(j + 1) * co].add(k[:, dw])
    return kb


def conv_wpack(x, k, b=B):
    n, h, w, ci = x.shape
    co = k.shape[3]
    wp = -w % b
    xw = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + wp), (0, 0)))  # H+2, W+2+wp
    wb = (w + wp) // b
    core = xw[:, :, 1:1 + w + wp].reshape(n, h + 2, wb, b, ci)
    left = xw[:, :, 0:w + wp:b][:, :, :, None, :]
    right = xw[:, :, b + 1::b]
    if right.shape[2] < wb:
        right = jnp.pad(right, ((0, 0), (0, 0), (0, wb - right.shape[2]),
                                (0, 0)))
    right = right[:, :, :, None, :]
    xb = jnp.concatenate([left, core, right], axis=3)  # (n, H+2, wb, b+2, ci)
    xb = xb.reshape(n, h + 2, wb, (b + 2) * ci)
    kb = build_kbig(k.astype(x.dtype), b)
    y = jnp.zeros((n, h, wb, b * co), jnp.float32)
    for kh in range(3):
        y = y + jnp.einsum("nhwk,kc->nhwc", xb[:, kh:kh + h], kb[kh],
                           preferred_element_type=jnp.float32)
    y = y.reshape(n, h, wb * b, co)[:, :, :w, :]
    return y.astype(x.dtype)


def conv_nchw(x, k):
    xn = x.transpose(0, 3, 1, 2)
    kn = k.transpose(3, 2, 0, 1).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        xn, kn, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y.transpose(0, 2, 3, 1)


def bench(fn, *args, iters=20):
    f = jax.jit(fn)
    s = float(jnp.sum(f(*args).astype(jnp.float32)))
    g = jax.jit(lambda: jnp.float32(0))
    float(g())
    t0 = time.time()
    for _ in range(5):
        float(g())
    rtt = (time.time() - t0) / 5
    t0 = time.time()
    for _ in range(iters):
        s += float(jnp.sum(f(*args).astype(jnp.float32)))
    return ((time.time() - t0) / iters - rtt) * 1e3


def main():
    rng = np.random.RandomState(0)
    shapes = ((516, 1724, 1, 16), (516, 1724, 16, 16), (258, 862, 16, 32),
              (258, 862, 32, 32), (129, 431, 32, 64), (129, 431, 64, 64))
    fns = {"ref": conv_ref, "mm9": conv_mm9, "wpack": conv_wpack,
           "nchw": conv_nchw}
    names = sys.argv[1:] or list(fns)
    for (h, w, ci, co) in shapes:
        x = jnp.asarray(rng.randn(1, h, w, ci), DT)
        k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.1, jnp.float32)
        ref = np.asarray(conv_ref(x, k), np.float32)
        row = {"shape": f"{h}x{w} {ci}->{co}"}
        for nm in names:
            y = np.asarray(fns[nm](x, k), np.float32)
            err = float(np.max(np.abs(y - ref)) / (np.max(np.abs(ref)) + 1e-9))
            if err > 0.05:
                row[nm] = f"WRONG {err:.3f}"
                continue
            row[nm] = round(bench(fns[nm], x, k), 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

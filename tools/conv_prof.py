#!/usr/bin/env python
"""Per-op TPU timings for the GAN/U-Net conv zoo (tunnel-aware).

Times each op by fetching a scalar per iteration and subtracting the
measured RTT (block_until_ready is a no-op over the axon tunnel).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_inpainting_tpu.ops.fastconv import conv3x3_same

H, W = 516, 1724
DT = jnp.bfloat16


def bench(fn, *args, iters=20):
    f = jax.jit(fn)
    s = float(jnp.sum(f(*args)))  # compile
    # RTT
    g = jax.jit(lambda: jnp.float32(0))
    float(g())
    t0 = time.time()
    for _ in range(5):
        float(g())
    rtt = (time.time() - t0) / 5
    t0 = time.time()
    for _ in range(iters):
        s += float(jnp.sum(f(*args)))
    dt = (time.time() - t0) / iters - rtt
    return dt * 1e3


def main():
    rng = np.random.RandomState(0)
    out = {}
    for ci, co in ((1, 16), (16, 16), (16, 32), (32, 32), (32, 64), (64, 64),
                   (96, 32), (48, 16)):
        hh, ww = (H, W) if ci <= 32 else (H // 2, W // 2)
        if ci >= 64 and co >= 64:
            hh, ww = H // 4, W // 4
        x = jnp.asarray(rng.randn(1, hh, ww, ci), DT)
        k = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
        g = jnp.asarray(rng.randn(1, hh, ww, co), DT)

        fwd = lambda x, k: conv3x3_same(x, k)
        t_f = bench(fwd, x, k)

        def dx_fn(x, k, g):
            _, vjp = jax.vjp(conv3x3_same, x, k)
            return vjp(g)[0]

        def dk_fn(x, k, g):
            _, vjp = jax.vjp(conv3x3_same, x, k)
            return vjp(g)[1]

        t_dx = bench(dx_fn, x, k, g)
        t_dk = bench(dk_fn, x, k, g)
        out[f"conv3x3 {ci}->{co} {hh}x{ww}"] = dict(
            fwd=round(t_f, 2), dx=round(t_dx - t_f, 2), dk=round(t_dk - t_f, 2))
        print(json.dumps({f"conv3x3 {ci}->{co} {hh}x{ww}":
                          out[f"conv3x3 {ci}->{co} {hh}x{ww}"]}), flush=True)

    # ConvTranspose k2 s2 (G ups) and strided k4 s2 (D)
    for ci, co, hh, ww, name in ((64, 32, H // 4, W // 4, "convT 64->32"),
                                 (32, 16, H // 2, W // 2, "convT 32->16")):
        x = jnp.asarray(rng.randn(1, hh, ww, ci), DT)
        k = jnp.asarray(rng.randn(2, 2, co, ci), DT)  # flax ConvTranspose HWOI? use lax directly

        def ct(x, k):
            return jax.lax.conv_transpose(x, k, (2, 2), "VALID",
                                          dimension_numbers=("NHWC", "HWIO", "NHWC"))

        k2 = jnp.asarray(rng.randn(2, 2, ci, co), DT)
        t = bench(ct, x, k2)
        print(json.dumps({name: round(t, 2)}), flush=True)

    for ci, co, hh, ww, name in ((1, 16, H, W, "D conv4s2 1->16"),
                                 (16, 32, H // 2, W // 2, "D conv4s2 16->32"),
                                 (32, 64, H // 4, W // 4, "D conv4s2 32->64")):
        x = jnp.asarray(rng.randn(1, hh, ww, ci), DT)
        k = jnp.asarray(rng.randn(4, 4, ci, co), DT)

        def sc(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t = bench(sc, x, k)
        print(json.dumps({name: round(t, 2)}), flush=True)


if __name__ == "__main__":
    main()

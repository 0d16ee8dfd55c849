#!/usr/bin/env python
"""Time the three AR extrapolation engines on the part-2 workload.

Compares, for the 88,200-sample 2 s gap (B=2 directions, order 100):
  - scan: per-sample lax.scan (88,200 sequential steps)
  - pallas: VMEM recurrence kernel (ops/pallas/ar_scan.py)
  - chunked: companion-matrix chunk mode (_extrapolate_chunked, k=128)

Wall is measured with a scalar fetch per rep (block_until_ready is a no-op
over the axon tunnel); first rep of each engine is the compile.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from audio_inpainting_tpu.methods.ar import (  # noqa: E402
    ARConfig, _extract_contexts, _extrapolate_chunked, _extrapolate_scan,
    _fit_ridge_batched)
from audio_inpainting_tpu.ops.pallas.ar_scan import (  # noqa: E402
    ar_extrapolate_pallas, pallas_supported)


def main() -> int:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 88200
    cfg = ARConfig()                       # order=100, texture, part-2 setup
    rng = np.random.RandomState(0)
    n = 441000
    x = (np.sin(np.arange(n) * 0.05) + 0.1 * rng.randn(n)).astype(np.float32)
    gs = (n - steps) // 2
    starts = jnp.asarray(np.array([gs], np.int32))
    ends = jnp.asarray(np.array([gs + steps], np.int32))
    ctxs, pads = _extract_contexts(jnp.asarray(x), starts, ends,
                                   cfg.context_len)
    w, b, std, valid = _fit_ridge_batched(ctxs, pads, cfg)
    key = jax.random.PRNGKey(0)

    def timed(tag, fn, reps=3):
        outs = []
        for r in range(reps):
            t0 = time.time()
            p = fn()
            s = float(jnp.sum(p))          # fetch = fence
            outs.append((time.time() - t0, s))
        walls = [w_ for w_, _ in outs]
        print(json.dumps({"engine": tag, "steps": steps,
                          "compile_s": round(walls[0], 3),
                          "steady_ms": round(min(walls[1:]) * 1e3, 1),
                          "checksum": outs[-1][1]}))

    timed("scan", lambda: _extrapolate_scan(ctxs, w, b, std, valid, key,
                                            steps, cfg.texture))
    if pallas_supported():
        B, C = ctxs.shape
        state0 = ctxs[:, C - cfg.order - 1 : C - 1]
        eps = jax.random.normal(key, (steps, B)).T
        gain = jnp.where(valid, 1.0, 0.0)
        timed("pallas", lambda: ar_extrapolate_pallas(
            state0, w, b, std, gain, eps, steps))
    timed("chunked", lambda: _extrapolate_chunked(
        ctxs, w, b, std, valid, key, steps, cfg.texture, 128))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

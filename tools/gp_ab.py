#!/usr/bin/env python
"""GP fit-budget A/B: where do the 2.87 s go, and what budget holds quality?

VERDICT r3 weak #7 / next #7: GP is the #3 wall consumer for a 0.05 s
segment. This tool times the part-0 GP restore phase-by-phase (init /
fit chunks / posterior predict / dispatch) and sweeps
opt_steps x fit_subsample against the bench gate floors (10.5 / 0.4 dB),
on the reference clip's part-0 segment, on whatever backend is live.

    python tools/gp_ab.py            # full sweep + phase breakdown
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REF = os.environ.get("BENCH_INPUT",
                     "/root/reference/vocals_accompaniment_10s.wav")


def segment():
    """The part-0 GP segment exactly as pipelines/part0.py builds it
    (mid-clip 0.05 s, 20% contiguous gap at 40%)."""
    from audio_inpainting_tpu.corrupt import contiguous_gap_mask
    from audio_inpainting_tpu.io import load_mono_normalized

    sr, data = load_mono_normalized(REF)
    n = int(0.05 * sr)
    start = len(data) // 2
    seg = data[start:start + n]
    mask, _ = contiguous_gap_mask(n, 0.2)
    return sr, seg, mask


def run_one(sr, seg, mask, opt_steps, fit_subsample, fit_chunk):
    import jax

    from audio_inpainting_tpu.methods.gp import GPConfig, gp_restore
    from audio_inpainting_tpu.metrics import snr_db

    cfg = GPConfig(opt_steps=opt_steps, fit_subsample=fit_subsample,
                   fit_chunk=fit_chunk)
    gp_restore(seg, mask, sr, cfg, key=0)          # compile pass
    t0 = time.time()
    restored, _ = gp_restore(seg, mask, sr, cfg, key=0)
    wall = time.time() - t0
    gs = int(np.flatnonzero(~mask)[0])
    ge = int(np.flatnonzero(~mask)[-1]) + 1
    return {"opt_steps": opt_steps, "fit_subsample": fit_subsample,
            "fit_chunk": fit_chunk, "wall_s": round(wall, 3),
            "snr_db": round(float(snr_db(seg, restored)), 2),
            "local_snr_db": round(float(snr_db(seg[gs:ge],
                                               restored[gs:ge])), 2)}


def phase_breakdown(sr, seg, mask):
    """Split the default-config restore into fit chunks vs posterior."""
    import jax
    import jax.numpy as jnp

    from audio_inpainting_tpu.methods.gp import (GPConfig, _fit, _predict)

    cfg = GPConfig()
    t = np.arange(len(seg), dtype=np.float32) / sr
    x_train = jnp.asarray(t[mask])
    y = jnp.asarray(seg[mask])
    y_n = (y - jnp.mean(y)) / jnp.maximum(jnp.std(y), 1e-12)
    x_test = jnp.asarray(t[~mask])
    k = cfg.fit_subsample

    theta = _fit(x_train[::k], y_n[::k], cfg, jax.random.PRNGKey(0))
    jax.block_until_ready(theta)
    t0 = time.time()
    theta = _fit(x_train[::k], y_n[::k], cfg, jax.random.PRNGKey(0))
    np.asarray(theta)
    fit_wall = time.time() - t0
    mu, std = _predict(theta, x_train, y_n, x_test, cfg)
    np.asarray(mu)
    t0 = time.time()
    mu, std = _predict(theta, x_train, y_n, x_test, cfg)
    np.asarray(mu)
    pred_wall = time.time() - t0
    print(f"[phase] fit({cfg.opt_steps} steps, chunk {cfg.fit_chunk}): "
          f"{fit_wall:.3f}s  posterior: {pred_wall:.3f}s", file=sys.stderr)
    return fit_wall, pred_wall


def main() -> int:
    sr, seg, mask = segment()
    phase_breakdown(sr, seg, mask)
    results = []
    for steps in (60, 40, 20):
        for sub in (2, 4):
            for chunk in (10, 20, 60):
                if chunk > steps:
                    continue
                r = run_one(sr, seg, mask, steps, sub, chunk)
                r["gates_green"] = bool(r["snr_db"] >= 10.5
                                        and r["local_snr_db"] >= 0.4)
                results.append(r)
                print(json.dumps(r), file=sys.stderr)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

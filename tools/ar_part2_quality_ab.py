#!/usr/bin/env python
"""Quality A/B for the part-2 AR leg: default engine vs chunk=128.

The chunked companion-matrix engine (methods/ar.py:_extrapolate_chunked)
measured 33.5 ms vs the Pallas kernel's 53.2 ms on the 88,200-step gap
(tools/ar_chunk_time.py, v5e). Flipping the pipeline default requires the
REAL-clip part-2 quality to hold (bench gate: snr_db >= 1.0); texture noise
draws are same-key in both engines but 88k steps of f32 reassociation can
drift, so score both on the exact bench workload across seeds.

Usage: python tools/ar_part2_quality_ab.py [seeds...]   (default 0..4)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_inpainting_tpu.corrupt import center_gap_bounds
from audio_inpainting_tpu.io import load_mono_normalized
from audio_inpainting_tpu.io.wav import save_wav_int16
from audio_inpainting_tpu.metrics import local_snr_db, lsd_db, snr_db
from audio_inpainting_tpu.methods import ARConfig, ar_restore_gap
from audio_inpainting_tpu.pipelines.part2 import detect_main_gap

INPUT = os.environ.get("BENCH_INPUT",
                       "/root/reference/vocals_accompaniment_10s.wav")


def main() -> int:
    seeds = [int(s) for s in sys.argv[1:]] or list(range(5))
    sr, data = load_mono_normalized(INPUT)
    data = data[:10 * sr]
    n = len(data)
    gs, ge = center_gap_bounds(n, sr)
    corrupted = data.copy()
    corrupted[gs:ge] = 0.0
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        save_wav_int16(corrupted, sr, f.name)
        _, damaged = load_mono_normalized(f.name)
    os.unlink(f.name)
    gap = detect_main_gap(damaged) or (gs, ge)

    for chunk in (0, 128):
        cfg = ARConfig(order=100, alpha=0.5, texture=True, context_len=5000,
                       chunk=chunk)
        for seed in seeds:
            t0 = time.time()
            ar = np.asarray(ar_restore_gap(jnp.asarray(damaged), gap, cfg,
                                           key=jax.random.PRNGKey(seed)))
            ar = np.clip(ar, -1.0, 1.0)
            print(json.dumps({
                "engine": "chunked" if chunk else "default",
                "seed": seed,
                "snr_db": round(float(snr_db(data, ar)), 3),
                "local_snr_db": round(float(local_snr_db(data, ar, gs, ge)), 3),
                "lsd_db": round(float(lsd_db(data, ar)), 3),
                "wall_s": round(time.time() - t0, 2),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

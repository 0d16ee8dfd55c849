#!/usr/bin/env python
"""Part-0 AR+texture sweep (reference main3_AR_text.py scores 9.46/-0.87 dB
unseeded; round-1 ours 8.22/-2.12). The knob is texture_scale: 1.0 matches
the reference's residual-sigma noise injection; lower trades spectral fill
for waveform accuracy. Sweeps scale x seeds to find a config that matches
or beats the reference's (stochastic) numbers.

Usage: python tools/ar_tex_ab.py [scale ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_inpainting_tpu.corrupt import contiguous_gap_mask
from audio_inpainting_tpu.io import load_mono_normalized
from audio_inpainting_tpu.metrics import local_snr_db, lsd_db, snr_db
from audio_inpainting_tpu.methods.ar import ARConfig, ar_restore_gap

INPUT = os.environ.get("BENCH_INPUT",
                       "/root/reference/vocals_accompaniment_10s.wav")


def main():
    scales = [float(s) for s in (sys.argv[1:] or
                                 ["1.0", "0.5", "0.25", "0.1", "0.0"])]
    sr, data = load_mono_normalized(INPUT)
    # part-0 contract (pipelines/part0.py): 50 ms segment from the middle,
    # 20% contiguous gap at 40%
    n = int(0.05 * sr)
    start = len(data) // 2
    signal = data[start:start + n]
    _, (gs, ge) = contiguous_gap_mask(n, 0.2)
    corrupted = signal.copy()
    corrupted[gs:ge] = 0.0
    for scale in scales:
        snrs, locs, lsds = [], [], []
        for seed in range(5):
            cfg = ARConfig(order=30, alpha=0.5, texture=True,
                           texture_scale=scale, context_len=max(gs, n - ge))
            out = np.asarray(ar_restore_gap(
                jnp.asarray(corrupted), (gs, ge), cfg,
                key=jax.random.PRNGKey(seed)))
            snrs.append(float(snr_db(signal, out)))
            locs.append(float(local_snr_db(signal, out, gs, ge)))
            lsds.append(float(lsd_db(signal, out)))
        print(json.dumps({
            "texture_scale": scale,
            "snr_db": round(float(np.mean(snrs)), 3),
            "snr_std": round(float(np.std(snrs)), 3),
            "local_snr_db": round(float(np.mean(locs)), 3),
            "lsd_db": round(float(np.mean(lsds)), 3),
        }), flush=True)


if __name__ == "__main__":
    main()

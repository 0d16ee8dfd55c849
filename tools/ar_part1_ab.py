#!/usr/bin/env python
"""Sweep part-1 AR configs (VERDICT round 1, weak #3 / task #7).

Targets: global SNR > damaged (the round-1 damaged baseline scored 4.87 dB)
while keeping the LSD win (round-1 ours 14.98; reference artifact 13.01).

Usage: python tools/ar_part1_ab.py
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

from audio_inpainting_tpu.corrupt import find_gaps, random_frame_mask
from audio_inpainting_tpu.io import load_mono_normalized
from audio_inpainting_tpu.io.wav import save_wav_int16
from audio_inpainting_tpu.metrics import lsd_db, snr_db
from audio_inpainting_tpu.methods import ARConfig, ar_restore_gaps
from audio_inpainting_tpu.ops import istft, stft, torch_stft_config
from audio_inpainting_tpu.ops.stft import magphase, polar

INPUT = os.environ.get("BENCH_INPUT",
                       "/root/reference/vocals_accompaniment_10s.wav")
_CFG = torch_stft_config(1024, 256)


def prepare(seed: int = 0):
    sr, data = load_mono_normalized(INPUT)
    data = data[:10 * sr]
    n = len(data)
    z = stft(jnp.asarray(data), _CFG)
    mag, phase = magphase(z)
    mask = random_frame_mask(jax.random.PRNGKey(seed), mag.shape[0],
                             mag.shape[1], mask_ratio=0.3)
    corrupted = np.asarray(istft(polar(mag * mask, phase), _CFG, n))
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        save_wav_int16(corrupted, sr, f.name)
        _, damaged = load_mono_normalized(f.name)
    os.unlink(f.name)
    print(json.dumps({"variant": "damaged",
                      "snr_db": round(float(snr_db(data, damaged)), 3),
                      "lsd_db": round(float(lsd_db(data, damaged)), 3)}),
          flush=True)
    return sr, data, damaged


def run_variant(name, cfg, data, damaged, seed=1):
    t0 = time.time()
    gaps = find_gaps(damaged, threshold=0.01, min_len=100)
    ar = np.asarray(ar_restore_gaps(jnp.asarray(damaged), gaps, cfg,
                                    key=jax.random.PRNGKey(seed)))
    ar = np.clip(ar, -1.0, 1.0)
    print(json.dumps({
        "variant": name, "n_gaps": len(gaps),
        "snr_db": round(float(snr_db(data, ar)), 3),
        "lsd_db": round(float(lsd_db(data, ar)), 3),
        "wall_s": round(time.time() - t0, 2)}), flush=True)


BASE = dict(order=30, alpha=0.5, texture=True, context_len=1000, passes=2)

VARIANTS = {
    "r1-current": ARConfig(**BASE),
    "no-texture": ARConfig(**{**BASE, "texture": False}),
    "passes1": ARConfig(**{**BASE, "passes": 1}),
    "passes3": ARConfig(**{**BASE, "passes": 3}),
    "order60": ARConfig(**{**BASE, "order": 60}),
    "ctx2000": ARConfig(**{**BASE, "context_len": 2000}),
    "minrows10": ARConfig(**{**BASE, "min_rows": 10}),
    "no-texture-o60-c2000": ARConfig(**{**BASE, "texture": False,
                                        "order": 60, "context_len": 2000}),
    "tex0.25": ARConfig(**{**BASE, "texture_scale": 0.25}),
    "tex0.4": ARConfig(**{**BASE, "texture_scale": 0.4}),
    "tex0.5": ARConfig(**{**BASE, "texture_scale": 0.5}),
    "tex0.6": ARConfig(**{**BASE, "texture_scale": 0.6}),
    "tex0.75": ARConfig(**{**BASE, "texture_scale": 0.75}),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    sr, data, damaged = prepare()
    for name in names:
        run_variant(name, VARIANTS[name], data, damaged)


if __name__ == "__main__":
    main()

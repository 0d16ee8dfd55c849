#!/usr/bin/env python
"""A/B experiment for the part-2 diffusion fill energy (VERDICT r1, weak #2).

Round-1: local SNR -10.2 dB (fill ~10x the original's energy). Gates:
local SNR >= -1 dB with LSD not much worse than the r1 14.x.

Variants test (composable):
  base        — DDPM + RePaint as shipped
  env         — + per-frequency-row envelope correction: match the filled
                columns' row means (log domain) to the interpolation of the
                surrounding known columns' row means
  envK        — env with K-row smoothing of the correction
  shrinkS     — scale the filled region's linear magnitude by S after env

Usage: python tools/diff_ab.py [variant ...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from audio_inpainting_tpu.corrupt import center_gap_bounds
from audio_inpainting_tpu.io import load_mono_normalized
from audio_inpainting_tpu.io.wav import save_wav_int16
from audio_inpainting_tpu.metrics import local_snr_db, lsd_db, snr_db
from audio_inpainting_tpu.methods.diffusion import (
    DiffusionConfig, _composite_time_domain, diffusion_inpaint_image,
    image_to_linear_spec, logspec_to_image, mask_from_image, wav_to_logspec)
from audio_inpainting_tpu.ops.griffin_lim import griffin_lim

INPUT = os.environ.get("BENCH_INPUT",
                       "/root/reference/vocals_accompaniment_10s.wav")


def prepare():
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
    return sr, data, damaged.astype(np.float32), n, gs, ge


def envelope_correct(img_f: np.ndarray, mask: np.ndarray, ctx: int = 10,
                     smooth: int = 1) -> np.ndarray:
    """Per-row mean correction of filled columns toward the neighbor
    interpolation, in the uint8-scaled log domain. img_f float (H, W)."""
    bad = (mask == 255).mean(axis=0) > 0.95
    cols = np.flatnonzero(bad)
    if cols.size == 0:
        return img_f
    c0, c1 = cols.min(), cols.max()
    left = img_f[:, max(0, c0 - ctx):c0]
    right = img_f[:, c1 + 1:c1 + 1 + ctx]
    lm = left.mean(axis=1) if left.shape[1] else right.mean(axis=1)
    rm = right.mean(axis=1) if right.shape[1] else lm
    # per-row target at the gap center = average of both sides
    target = 0.5 * (lm + rm)
    fill_mean = img_f[:, cols].mean(axis=1)
    delta = target - fill_mean
    if smooth > 1:
        k = np.ones(smooth, np.float32) / smooth
        delta = np.convolve(delta, k, mode="same")
    out = img_f.copy()
    out[:, cols] += delta[:, None]
    return np.clip(out, 0.0, 255.0)


def run_variant(name: str, sr, data, damaged, n, gs, ge, env=False, smooth=1,
                shrink=1.0, escale=None, seed=0):
    t0 = time.time()
    logspec = np.asarray(wav_to_logspec(jnp.asarray(damaged)))
    img, smin, smax = logspec_to_image(logspec)
    mask = mask_from_image(img)
    inpainted = diffusion_inpaint_image(img, mask, DiffusionConfig(),
                                        key=seed).astype(np.float32)
    if env:
        inpainted = envelope_correct(inpainted, mask, smooth=smooth)
    linear = image_to_linear_spec(inpainted, smin, smax)
    if shrink != 1.0:
        badc = (mask == 255).mean(axis=0) > 0.95
        linear[:, badc] *= shrink
    out = np.asarray(griffin_lim(jnp.asarray(linear), n_fft=2048, hop=512,
                                 n_iter=32, length=n, power=1.0, seed=seed))
    if escale is not None:
        # scale the fill so its gap power = escale * surrounding power
        ctxn = ge - gs
        ctx = np.concatenate([damaged[max(0, gs - ctxn):gs],
                              damaged[ge:ge + ctxn]])
        e_ctx = float(np.mean(ctx ** 2))
        e_fill = float(np.mean(out[gs:ge] ** 2))
        out = out * np.sqrt(escale * e_ctx / max(e_fill, 1e-12))
    final = _composite_time_domain(damaged, out, mask)
    final = np.clip(final, -1.0, 1.0)
    res = {
        "variant": name,
        "snr_db": round(float(snr_db(data, final)), 3),
        "local_snr_db": round(float(local_snr_db(data, final, gs, ge)), 3),
        "lsd_db": round(float(lsd_db(data, final)), 3),
        "fill_energy_ratio": round(float(
            np.sum(final[gs:ge] ** 2) / max(np.sum(data[gs:ge] ** 2), 1e-12)), 3),
        "wall_s": round(time.time() - t0, 2),
    }
    print(json.dumps(res), flush=True)
    return res


VARIANTS = {
    "base": {},
    "env": {"env": True},
    "env5": {"env": True, "smooth": 5},
    "env-shrink0.5": {"env": True, "shrink": 0.5},
    "env-shrink0.35": {"env": True, "shrink": 0.35},
    "shrink0.3": {"shrink": 0.3},
    "escale1.0": {"escale": 1.0},
    "escale0.5": {"escale": 0.5},
    "escale0.25": {"escale": 0.25},
    "escale0.15": {"escale": 0.15},
}


def main():
    names = sys.argv[1:] or ["base", "env", "env5"]
    ctx = prepare()
    for nm in names:
        run_variant(nm, *ctx, **VARIANTS[nm])


if __name__ == "__main__":
    main()

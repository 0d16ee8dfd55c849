"""Part 0: tiny contiguous gap in a 0.05 s mid-clip segment.

Four restorations of a 20% gap at 40% of the segment, replicating the
reference scripts' scenario drivers (main1_gp.py:161-172, main2_AR.py:154-165,
main3_AR_text.py, main4_NMF.py:163-174) with one shared load/mask path.
Emits the part0 artifact set and returns the SNR table the reference only
printed.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..corrupt import contiguous_gap_mask
from ..io import load_mono_normalized
from ..io.viz import (ar_texture_waveform_viz, ar_waveform_viz,
                      gp_waveform_viz, nmf_waveform_viz)
from ..metrics import local_snr_db, snr_db
from ..methods import ARConfig, ar_restore_gap
from ..methods.ar import ar_restore_gap_detailed
from ..methods.gp import GPConfig, gp_restore
from ..methods.nmf import NMFConfig, nmf_inpaint_iterative
from ..ops import scipy_stft_config, stft, istft
from ..ops.stft import magphase, polar
from .registry import write_artifacts


def _metrics(name, original, restored, gs, ge, t0, results):
    results[name] = {
        "snr_db": float(snr_db(original, restored)),
        "local_snr_db": float(local_snr_db(original, restored, gs, ge)),
        "wall_s": time.time() - t0,
    }


def synthetic_signal(duration: float = 0.05, sr: int = 16000,
                     seed: int = 0) -> tuple[int, np.ndarray]:
    """The reference's synthetic fallback: 200 + 450 Hz sines + noise at
    16 kHz, used when no input file exists (main1_gp.py:53-59; reference is
    unseeded — seeded here)."""
    t = np.linspace(0, duration, int(duration * sr), dtype=np.float32)
    rng = np.random.RandomState(seed)
    sig = (0.5 * np.sin(2 * np.pi * 200 * t)
           + 0.3 * np.sin(2 * np.pi * 450 * t)
           + 0.02 * rng.randn(len(t)))
    return sr, sig.astype(np.float32)


def run_part0(input_file: str | None, assets_dir: str = "demo_assets",
              duration: float = 0.05, gap_ratio: float = 0.2,
              seed: int = 0, gp_cfg: GPConfig | None = None) -> dict:
    if input_file is None or not os.path.exists(input_file):
        # reference behavior: synthesize when the clip is missing
        sr, signal = synthetic_signal(duration, seed=seed)
        n = len(signal)
    else:
        sr, data = load_mono_normalized(input_file)
        n = int(duration * sr)
        start = len(data) // 2
        signal = data[start : start + n]
    mask, (gs, ge) = contiguous_gap_mask(n, gap_ratio)
    corrupted = signal.copy()
    corrupted[gs:ge] = 0.0
    results: dict = {"gap": (gs, ge), "sr": sr}

    t_axis = np.arange(n, dtype=np.float32) / sr

    # --- GP (main1_gp.py) ---
    t0 = time.time()
    gp_out, sigma = gp_restore(signal, mask, sr, gp_cfg or GPConfig(), key=seed)
    _metrics("gp", signal, gp_out, gs, ge, t0, results)
    write_artifacts(corrupted, sr, assets_dir, "part0", "gp_corrupted")
    write_artifacts(gp_out, sr, assets_dir, "part0", "gp")
    write_artifacts(signal, sr, assets_dir, "part0", "gp_original")
    gp_waveform_viz(t_axis, signal, gp_out, sigma, (gs, ge),
                    os.path.join(assets_dir, "part0", "gp_waveform_viz.png"))

    # --- synthetic GP demo (reference demo_assets/part0/
    # synthetic_gp_restoration.png: the main1_gp.py fallback run on its
    # 200+450 Hz synthetic signal, shipped alongside the real-clip assets).
    # The 800-sample fit is ~20x cheaper than the real segment's.
    t0 = time.time()
    syn_sr, syn_sig = synthetic_signal(duration, seed=seed)
    syn_mask, (ss, se) = contiguous_gap_mask(len(syn_sig), gap_ratio)
    syn_dmg = syn_sig.copy()
    syn_dmg[ss:se] = 0.0
    syn_out, syn_sigma = gp_restore(syn_sig, syn_mask, syn_sr,
                                    gp_cfg or GPConfig(), key=seed)
    gp_waveform_viz(np.arange(len(syn_sig), dtype=np.float32) / syn_sr,
                    syn_sig, syn_out, syn_sigma, (ss, se),
                    os.path.join(assets_dir, "part0",
                                 "synthetic_gp_restoration.png"))
    _metrics("gp_synthetic", syn_sig, syn_out, ss, se, t0, results)

    # --- Bidirectional AR, order 30, no texture (main2_AR.py) ---
    t0 = time.time()
    cfg = ARConfig(order=30, alpha=0.1, texture=False, context_len=max(gs, n - ge))
    ar_j, fwd, bwd = ar_restore_gap_detailed(jnp.asarray(corrupted), (gs, ge),
                                             cfg, key=seed)
    ar_out = np.asarray(ar_j)
    _metrics("ar", signal, ar_out, gs, ge, t0, results)
    write_artifacts(corrupted, sr, assets_dir, "part0", "ar_corrupted")
    write_artifacts(ar_out, sr, assets_dir, "part0", "ar")
    write_artifacts(signal, sr, assets_dir, "part0", "ar_original")
    ar_waveform_viz(t_axis, signal, ar_out, fwd, bwd, (gs, ge),
                    os.path.join(assets_dir, "part0", "ar_waveform_viz.png"),
                    order=30)

    # --- AR + texture injection (main3_AR_text.py) ---
    # The reference's noise injection is UNSEEDED (main3_AR_text.py:74), so a
    # single run is a draw from a ~±1 dB distribution. Official policy: run
    # n_texture_seeds draws, report mean±std, and ship the median-SNR draw as
    # the artifact (seed-0 alone undersold parity: 8.22 vs the 5-seed mean
    # 9.47 against the reference's unseeded 9.46; tools/ar_tex_ab.py).
    t0 = time.time()
    cfg = ARConfig(order=30, alpha=0.5, texture=True, context_len=max(gs, n - ge))
    corr_j = jnp.asarray(corrupted)
    n_seeds = 5
    draws = [np.asarray(ar_restore_gap(corr_j, (gs, ge), cfg,
                                       key=seed + 1000 * i))
             for i in range(n_seeds)]
    snrs = np.array([snr_db(signal, d) for d in draws])
    med = int(np.argsort(snrs)[len(snrs) // 2])
    art_out = draws[med]
    _metrics("ar_texture", signal, art_out, gs, ge, t0, results)
    results["ar_texture"]["snr_db_mean"] = float(np.mean(snrs))
    results["ar_texture"]["snr_db_std"] = float(np.std(snrs))
    results["ar_texture"]["n_seeds"] = n_seeds
    write_artifacts(corrupted, sr, assets_dir, "part0", "ar_texture_corrupted")
    write_artifacts(art_out, sr, assets_dir, "part0", "ar_texture")
    write_artifacts(signal, sr, assets_dir, "part0", "ar_texture_original")
    ar_texture_waveform_viz(
        t_axis, signal, art_out, (gs, ge),
        os.path.join(assets_dir, "part0", "ar_texture_waveform_viz.png"))

    # --- Iterative NMF (main4_NMF.py): 512/384 STFT, faded gap, 50 refits ---
    t0 = time.time()
    nmf_corr = signal.copy()
    fade_len = min(100, gs, n - ge)
    if fade_len > 0:  # reference fades into the gap (main4_NMF.py:53-58)
        window = np.linspace(1, 0, fade_len, dtype=np.float32)
        nmf_corr[gs - fade_len : gs] *= window
        nmf_corr[ge : ge + fade_len] *= window[::-1]
    nmf_corr[gs:ge] = 0.0
    scfg = scipy_stft_config(512, 384)
    z = stft(jnp.asarray(nmf_corr), scfg)
    mag, phase = magphase(z)
    t_step = 128 / sr  # hop/sr: scipy stft frame spacing
    col_start = int(gs / sr / t_step)
    col_end = int(ge / sr / t_step)
    out_mag = nmf_inpaint_iterative(
        mag, col_start, col_end,
        NMFConfig(n_components=40, n_iter=200, outer_iters=50),
        jax.random.PRNGKey(seed))
    nmf_out = np.asarray(istft(polar(out_mag, phase), scfg, n))
    # boundary crossfade back into the clean signal (main4_NMF.py:114-126)
    final = signal.copy()
    bw = 50
    ramp = np.linspace(0, 1, bw, dtype=np.float32)
    final[gs:ge] = nmf_out[gs:ge]
    final[gs - bw : gs] = final[gs - bw : gs] * (1 - ramp) + nmf_out[gs - bw : gs] * ramp
    final[ge : ge + bw] = final[ge : ge + bw] * ramp + nmf_out[ge : ge + bw] * (1 - ramp)
    _metrics("nmf", signal, final, gs, ge, t0, results)
    write_artifacts(nmf_corr, sr, assets_dir, "part0", "nmf_corrupted")
    write_artifacts(final, sr, assets_dir, "part0", "nmf")
    write_artifacts(signal, sr, assets_dir, "part0", "nmf_original")
    restored_mag = jnp.abs(stft(jnp.asarray(final), scfg))
    nmf_waveform_viz(signal, final, (gs, ge), sr, restored_mag,
                     os.path.join(assets_dir, "part0", "nmf_waveform_viz.png"))

    return results

"""Part 1: random STFT-frame dropouts over the full 10 s clip.

Flow (replicating the reference's inter-script WAV chaining, SURVEY.md §1):

1. corrupt: STFT (1024/256) -> SpecAugment-style random frame mask ->
   iSTFT with original phase -> publish ``damaged_random.wav`` as the common
   baseline (main5_UNet_mask.py:111-156). Seeded here, unlike the reference.
2. linear: reload the damaged WAV (int16 chain), detect by |x|>1e-4, fill
   with np.interp semantics (linear_interp_part1.py).
3. AR: reload, blind-detect the dropped STFT columns, invert the OLA
   attenuation exactly where possible (methods/ola_eq.py — beyond-reference),
   then bidirectional texture AR over the residual deep gaps, all batched
   (reference family: main3_AR_text_mask.py).
4. NMF: reload, per-column silent-fraction mask (0.01 / 80%), one-shot
   masked NMF (main4_NMF_mask.py).
5. U-Net: per-clip masked-MSE training (400 epochs), composite, iSTFT
   (main5_UNet_mask.py:158-193).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..corrupt import random_frame_mask, silent_frame_columns
from ..io import load_mono_normalized
from ..metrics import snr_db, lsd_db
from ..methods import ARConfig, ar_restore_gaps, linear_interp_masked
from ..methods.ola_eq import equalize_dropped_frames
from ..methods.neural import UNetTrainConfig, unet_train_restore
from ..methods.nmf import NMFConfig, nmf_inpaint_columns
from ..ops import torch_stft_config, stft, istft
from ..ops.stft import magphase, polar
from .registry import asset_path, write_artifacts

_CFG = torch_stft_config(1024, 256)


def _metrics(name, original, restored, t0, results):
    results[name] = {
        "snr_db": float(snr_db(original, restored)),
        "lsd_db": float(lsd_db(original, restored)),
        "wall_s": time.time() - t0,
    }


def run_part1(input_file: str, assets_dir: str = "demo_assets", seed: int = 0,
              unet_epochs: int = 400, mask_ratio: float = 0.3) -> dict:
    sr, data = load_mono_normalized(input_file)
    n = len(data)
    results: dict = {"sr": sr}

    # --- 1. corruption + publish baseline -------------------------------
    t0 = time.time()
    z = stft(jnp.asarray(data), _CFG)
    mag, phase = magphase(z)
    mag_max = jnp.max(mag)
    mag_norm = mag / mag_max
    mask = random_frame_mask(jax.random.PRNGKey(seed), mag.shape[0],
                             mag.shape[1], mask_ratio=mask_ratio)
    input_mag = mag_norm * mask
    corrupted = np.asarray(istft(polar(input_mag * mag_max, phase), _CFG, n))
    _metrics("damaged", data, corrupted, t0, results)
    write_artifacts(corrupted, sr, assets_dir, "part1", "damaged")
    write_artifacts(data, sr, assets_dir, "part1", "original")

    # reload through the int16 chain, as the downstream scripts do
    _, damaged = load_mono_normalized(asset_path(assets_dir, "part1", "damaged"))

    # --- 2. linear interpolation -----------------------------------------
    # linear_interp_part1.py uses threshold 1e-4, which misses iSTFT-produced
    # near-silence (~1e-3..1e-2); its sibling scripts raised it to 0.01 for
    # exactly this input (main3_AR_text_mask.py:33, main4_NMF_mask.py:31).
    # We use 0.01 so the baseline actually detects the published corruption.
    t0 = time.time()
    valid = np.abs(damaged) > 0.01
    lin = np.asarray(linear_interp_masked(jnp.asarray(damaged), jnp.asarray(valid)))
    _metrics("linear", data, lin, t0, results)
    write_artifacts(lin, sr, assets_dir, "part1", "linear")

    # --- 3. AR multi-gap: OLA gain equalization + texture AR fill ---------
    # Beyond-reference (methods/ola_eq.py): the frame-dropout corruption
    # attenuates gap shoulders by an exactly-invertible OLA gain; equalize
    # those, then AR-fill only the deep interior (a ~ 0). texture_scale=0.1
    # keeps the texture's spectral-energy fill at a tenth of the reference's
    # residual sigma — measured Pareto point (tools/ar_part1_ab.py): global
    # SNR 4.99 dB (> 4.87 damaged) and LSD 12.2 (< reference AR's 13.01).
    t0 = time.time()
    eq, gaps, _gain = equalize_dropped_frames(damaged, mag.shape[1])
    results["n_gaps"] = len(gaps)
    ar = np.asarray(ar_restore_gaps(
        jnp.asarray(eq), gaps,
        ARConfig(order=30, alpha=0.5, texture=True, texture_scale=0.1,
                 context_len=1000, passes=2),
        key=jax.random.PRNGKey(seed + 1)))
    ar = np.clip(ar, -1.0, 1.0)
    _metrics("ar", data, ar, t0, results)
    write_artifacts(ar, sr, assets_dir, "part1", "ar")

    # --- 4. one-shot NMF over detected bad columns -----------------------
    t0 = time.time()
    zd = stft(jnp.asarray(damaged), _CFG)
    mag_d, phase_d = magphase(zd)
    bad = np.zeros(mag_d.shape[1], bool)
    bad[silent_frame_columns(damaged, mag_d.shape[1], 256,
                             threshold=0.01, silent_fraction=0.8)] = True
    out_mag = nmf_inpaint_columns(mag_d, jnp.asarray(bad),
                                  NMFConfig(n_components=40, n_iter=200),
                                  jax.random.PRNGKey(42))
    nmf = np.asarray(istft(polar(out_mag, phase_d), _CFG, n))
    _metrics("nmf", data, nmf, t0, results)
    results["nmf"]["bad_cols"] = int(bad.sum())
    write_artifacts(nmf, sr, assets_dir, "part1", "nmf")

    # --- 5. U-Net self-supervised inpainting ----------------------------
    t0 = time.time()
    final_norm, pred, losses = unet_train_restore(
        mag_norm, mask[0:mag.shape[0]],
        UNetTrainConfig(epochs=unet_epochs, masked_loss=True, bf16=True),
        key=seed)
    unet = np.asarray(istft(polar(jnp.asarray(final_norm) * mag_max, phase),
                            _CFG, n))
    _metrics("unet", data, unet, t0, results)
    results["unet"]["final_loss"] = float(losses[-1])
    write_artifacts(unet, sr, assets_dir, "part1", "unet", clip=0.99)
    from ..io.viz import unet_panels_viz
    import os as _os

    unet_panels_viz(np.asarray(input_mag), np.asarray(pred), np.asarray(mag_norm),
                    _os.path.join(assets_dir, "part1",
                                  "spectrogram_comparison.png"))

    return results

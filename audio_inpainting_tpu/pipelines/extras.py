"""Extra (non-demo-contract) scenario drivers.

run_unet_gap reproduces main5_UNet_gap.py: the Part-2 style deterministic 2D
STFT gap (frames 40-60%), full-spectrogram MSE loss (the overfitting
demonstration — loss over everything, not just the hole, main5_UNet_gap.py:
142), 600 epochs, emitting ``dl_corrupted.wav`` / ``dl_restored.wav``
(the reference writes these to the CWD; we put them under the assets root).
These artifacts are not consumed by the demo, hence kept out of the
ASSET_REGISTRY contract.
"""

from __future__ import annotations

import os
import time

import jax.numpy as jnp
import numpy as np

from ..corrupt import frame_gap_mask_2d
from ..io import load_mono_normalized, save_wav_int16, save_spectrogram_png
from ..metrics import snr_db
from ..methods.neural import UNetTrainConfig, unet_train_restore
from ..ops import torch_stft_config, stft, istft
from ..ops.stft import magphase, polar

_CFG = torch_stft_config(1024, 256)


def run_generate_part1(input_file: str, assets_dir: str = "demo_assets",
                       mask_ratio: float = 0.25, seed: int = 0) -> dict:
    """Time-domain random-dropout corruption + inline linear fill — the
    reference's generate_part1_data.py (gaps 50-400 samples, ratio 0.25,
    np.interp fill), seeded here. Writes damaged_random / fixed_linear_random
    / original under the assets root, as the reference did."""
    import jax

    from ..corrupt import random_dropout_mask
    from ..methods import linear_interp_masked

    sr, data = load_mono_normalized(input_file)
    mask = np.asarray(random_dropout_mask(
        jax.random.PRNGKey(seed), len(data), mask_ratio=mask_ratio))
    corrupted = data.copy()
    corrupted[~mask] = 0.0
    fixed = np.asarray(linear_interp_masked(jnp.asarray(corrupted),
                                            jnp.asarray(mask)))

    out = {}
    for name, audio in [("damaged_random", corrupted),
                        ("fixed_linear_random", fixed),
                        ("original", data)]:
        save_wav_int16(audio, sr, os.path.join(assets_dir, f"{name}.wav"))
        save_spectrogram_png(audio, sr,
                             os.path.join(assets_dir, f"spec_{name}.png"))
    out["damaged_snr_db"] = float(snr_db(data, corrupted))
    out["linear_snr_db"] = float(snr_db(data, fixed))
    out["lost_fraction"] = float(1 - mask.mean())
    return out


def run_unet_gap(input_file: str, assets_dir: str = "demo_assets",
                 duration: float = 10.0, epochs: int = 600,
                 seed: int = 0) -> dict:
    sr, data = load_mono_normalized(input_file)
    n = min(len(data), int(duration * sr))
    data = data[:n]

    z = stft(jnp.asarray(data), _CFG)
    mag, phase = magphase(z)
    mag_max = jnp.max(mag)
    mag_norm = mag / mag_max
    mask = frame_gap_mask_2d(mag.shape[0], mag.shape[1])

    corrupted = np.asarray(istft(polar(mag_norm * mask * mag_max, phase), _CFG, n))

    t0 = time.time()
    final_norm, _pred, losses = unet_train_restore(
        mag_norm, mask, UNetTrainConfig(epochs=epochs, masked_loss=False, bf16=True),
        key=seed)
    restored = np.asarray(istft(polar(jnp.asarray(final_norm) * mag_max, phase),
                                _CFG, n))
    wall = time.time() - t0

    save_wav_int16(corrupted, sr, os.path.join(assets_dir, "dl_corrupted.wav"),
                   clip=0.99)
    save_wav_int16(restored, sr, os.path.join(assets_dir, "dl_restored.wav"),
                   clip=0.99)
    save_spectrogram_png(restored, sr,
                         os.path.join(assets_dir, "spec_dl_restored_gap.png"))
    return {"snr_db": float(snr_db(data, restored)),
            "final_loss": float(losses[-1]), "wall_s": wall}

"""Waveform/diagnostic visualizations (L4), reference-style.

Reproduces the reference's per-method diagnostic figures:
- GP: ground truth + gap span + restoration + 95% confidence band
  (main1_gp.py:126-159)
- AR: ground truth + fwd/bwd prediction overlays + blended result
  (main2_AR.py:134-152)
- NMF: waveform overlay + restored-spectrogram pcolormesh subplot
  (main4_NMF.py:139-161)
- U-Net: input / prediction / target 3-panel magnitude comparison
  (main5_UNet_mask.py:195-226)

All render host-side from device-computed arrays (matplotlib Agg).
"""

from __future__ import annotations

import os

import numpy as np

try:  # pragma: no cover
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAVE_MPL = True
except Exception:  # pragma: no cover
    _HAVE_MPL = False


def _save(fig, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=300, bbox_inches="tight")
    plt.close(fig)
    return path


def gp_waveform_viz(t, signal, restored, sigma, gap: tuple[int, int],
                    path: str) -> str | None:
    if not _HAVE_MPL:  # pragma: no cover
        return None
    gs, ge = gap
    fig = plt.figure(figsize=(12, 6))
    plt.plot(t, signal, "gray", alpha=0.5, label="Ground Truth")
    plt.axvspan(t[gs], t[min(ge, len(t) - 1)], color="red", alpha=0.1,
                label="Missing Gap")
    gap_t = t[gs:ge]
    gap_r = restored[gs:ge]
    plt.plot(gap_t, gap_r, "r-", linewidth=2, label="GP Restoration")
    plt.fill_between(gap_t, gap_r - 1.96 * sigma, gap_r + 1.96 * sigma,
                     color="red", alpha=0.2, label="95% Confidence")
    plt.title("Audio Inpainting: Gaussian Process with Periodic Kernel")
    plt.xlabel("Time (s)")
    plt.ylabel("Amplitude")
    plt.legend(loc="upper right")
    return _save(fig, path)


def ar_waveform_viz(t, signal, restored, pred_fwd, pred_bwd,
                    gap: tuple[int, int], path: str, order: int) -> str | None:
    if not _HAVE_MPL:  # pragma: no cover
        return None
    gs, ge = gap
    fig = plt.figure(figsize=(12, 6))
    plt.plot(t, signal, "gray", alpha=0.4, label="Ground Truth")
    plt.axvspan(t[gs], t[min(ge, len(t) - 1)], color="red", alpha=0.1)
    gap_t = t[gs:ge]
    plt.plot(gap_t, pred_fwd, "b--", alpha=0.5, linewidth=1, label="Forward Pred")
    plt.plot(gap_t, pred_bwd, "g--", alpha=0.5, linewidth=1, label="Backward Pred")
    plt.plot(gap_t, restored[gs:ge], "r-", linewidth=2.5,
             label="Bidirectional AR (Final)")
    plt.title(f"Voice Inpainting: Bidirectional AR (Order={order})")
    plt.legend()
    return _save(fig, path)


def ar_texture_waveform_viz(t, signal, restored, gap: tuple[int, int],
                            path: str) -> str | None:
    """Texture-injected AR figure (main3_AR_text.py:138-149): ground truth
    in gray, the restored gap segment in red over a shaded gap span."""
    if not _HAVE_MPL:  # pragma: no cover
        return None
    gs, ge = gap
    fig = plt.figure(figsize=(12, 6))
    plt.plot(t, signal, "gray", alpha=0.3, label="Ground Truth")
    plt.plot(t[gs:ge], restored[gs:ge], "r-", linewidth=1,
             label="Restored (with Texture)")
    plt.axvspan(t[gs], t[min(ge, len(t) - 1)], color="red", alpha=0.1)
    plt.title("Final Result: Bidirectional AR + Noise Injection")
    plt.legend()
    return _save(fig, path)


def nmf_waveform_viz(signal, restored, gap: tuple[int, int], sr: int,
                     restored_mag, path: str) -> str | None:
    if not _HAVE_MPL:  # pragma: no cover
        return None
    gs, ge = gap
    fig = plt.figure(figsize=(14, 8))
    plt.subplot(2, 1, 1)
    plt.plot(signal, "gray", alpha=0.5, label="Original")
    plt.plot(restored, "b--", alpha=0.8, linewidth=1, label="NMF Restored")
    plt.axvspan(gs, ge, color="red", alpha=0.1, label="Gap")
    plt.legend()
    plt.title("Time Domain: Waveform")
    plt.subplot(2, 1, 2)
    plt.pcolormesh(np.asarray(restored_mag), shading="gouraud", cmap="inferno")
    plt.title("Frequency Domain: Restored Spectrogram")
    plt.ylabel("Frequency bin")
    plt.xlabel("Frame")
    plt.tight_layout()
    return _save(fig, path)


def unet_panels_viz(input_mag, pred_mag, target_mag, path: str,
                    pdf: bool = True) -> str | None:
    if not _HAVE_MPL:  # pragma: no cover
        return None
    fig = plt.figure(figsize=(15, 6))
    for i, (title, m) in enumerate([
            ("Input (Randomly Masked)", input_mag),
            ("U-Net Prediction", pred_mag),
            ("Ground Truth", target_mag)]):
        plt.subplot(1, 3, i + 1)
        plt.title(title)
        plt.imshow(np.asarray(m), aspect="auto", origin="lower", cmap="inferno")
        plt.axis("off")
    plt.tight_layout()
    out = _save(fig, path)
    if pdf and out:
        base, _ = os.path.splitext(path)
        fig2 = plt.figure(figsize=(15, 6))
        for i, (title, m) in enumerate([
                ("Input (Randomly Masked)", input_mag),
                ("U-Net Prediction", pred_mag),
                ("Ground Truth", target_mag)]):
            plt.subplot(1, 3, i + 1)
            plt.title(title)
            plt.imshow(np.asarray(m), aspect="auto", origin="lower", cmap="inferno")
            plt.axis("off")
        plt.tight_layout()
        fig2.savefig(base + ".pdf", bbox_inches="tight")
        plt.close(fig2)
    return out

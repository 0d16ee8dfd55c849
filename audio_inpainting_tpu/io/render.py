"""L4 artifact rendering: spectrogram PNGs in the reference's house style.

The reference renders every artifact with
``plt.specgram(audio, NFFT=1024, Fs=sr, noverlap=512, cmap='inferno')``
axes off, tight layout (duplicated across 9 scripts, e.g. main1_gp.py:11-19).
Those PNGs are part of the demo's file contract, so we reproduce the style:
matplotlib when available (it is in this image), with a pure-PIL fallback that
renders the same log-power spectrogram through the inferno colormap so the
framework stays functional in minimal images.

The spectrogram itself is computed on-device (JAX STFT); only colormapping
and PNG encoding happen on host.
"""

from __future__ import annotations

import os

import numpy as np

try:  # pragma: no cover - environment probe
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAVE_MPL = True
except Exception:  # pragma: no cover
    _HAVE_MPL = False


def save_spectrogram_png(audio: np.ndarray, sr: int, path: str,
                         nfft: int = 1024, noverlap: int = 512) -> str:
    """Save the reference-style inferno spectrogram PNG for ``audio``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    audio = np.asarray(audio, dtype=np.float32)
    if _HAVE_MPL:
        fig = plt.figure(figsize=(10, 4))
        plt.specgram(audio, NFFT=nfft, Fs=sr, noverlap=noverlap, cmap="inferno")
        plt.axis("off")
        plt.tight_layout(pad=0)
        plt.savefig(path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
    else:  # pragma: no cover - exercised only in minimal images
        _save_png_fallback(audio, sr, path, nfft, noverlap)
    return path


def save_image_png(array2d: np.ndarray, path: str, cmap: str = "inferno",
                   origin: str = "lower") -> str:
    """Save a 2D array as a colormapped PNG (used for raw magnitude views)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    a = np.asarray(array2d, dtype=np.float32)
    if _HAVE_MPL:
        fig = plt.figure(figsize=(10, 4))
        plt.imshow(a, aspect="auto", origin=origin, cmap=cmap)
        plt.axis("off")
        plt.tight_layout(pad=0)
        plt.savefig(path, bbox_inches="tight", pad_inches=0)
        plt.close(fig)
    else:  # pragma: no cover
        from PIL import Image

        img = _colormap_inferno(_minmax01(a))
        if origin == "lower":
            img = img[::-1]
        Image.fromarray(img).save(path)
    return path


def _minmax01(a: np.ndarray) -> np.ndarray:
    lo, hi = float(a.min()), float(a.max())
    return (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)


def _colormap_inferno(x01: np.ndarray) -> np.ndarray:
    # Coarse 8-anchor approximation of matplotlib's inferno, linearly blended.
    anchors = np.array(
        [(0, 0, 4), (40, 11, 84), (101, 21, 110), (159, 42, 99),
         (212, 72, 66), (245, 125, 21), (250, 193, 39), (252, 255, 164)],
        dtype=np.float32,
    )
    pos = np.clip(x01, 0.0, 1.0) * (len(anchors) - 1)
    i0 = np.floor(pos).astype(np.int32)
    i1 = np.minimum(i0 + 1, len(anchors) - 1)
    w = (pos - i0)[..., None]
    rgb = anchors[i0] * (1 - w) + anchors[i1] * w
    return rgb.astype(np.uint8)


def _save_png_fallback(audio: np.ndarray, sr: int, path: str,
                       nfft: int, noverlap: int) -> None:  # pragma: no cover
    from PIL import Image

    hop = nfft - noverlap
    n_frames = max(1, 1 + (len(audio) - nfft) // hop)
    win = np.hanning(nfft).astype(np.float32)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(nfft)[None, :]
    frames = audio[np.minimum(idx, len(audio) - 1)] * win
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    logspec = 10.0 * np.log10(np.maximum(spec.T, 1e-12))
    img = _colormap_inferno(_minmax01(logspec))[::-1]
    Image.fromarray(img).save(path)

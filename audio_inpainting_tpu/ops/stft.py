"""L1 time-frequency transforms, TPU-native.

The reference uses two STFT conventions (SURVEY.md §7 "hard parts"):

- scipy convention: ``scipy.signal.stft(x, fs, nperseg, noverlap)`` —
  periodic Hann, zero boundary extension of nperseg//2, end-padding to a
  whole frame count, spectrum scaling 1/win.sum()
  (reference main4_NMF.py:69, main4_NMF_gap.py:45-47).
- torch convention: ``torch.stft(x, n_fft, hop, window=hann, center=True)``
  — reflect center padding, no scaling
  (reference main5_UNet_mask.py:77-82, main_gan_gap.py:86).

Design: instead of translating FFT-library calls, the transform is expressed
as *framing + two matmuls against real-DFT basis matrices*. On TPU this puts
the FLOPs on the MXU (a (frames, n_fft) @ (n_fft, n_bins) matmul), lets XLA
fuse the window multiply into the matmul operand, and keeps every shape
static. An ``fft`` backend (jnp.fft.rfft) is kept for cross-checking.

Everything is jittable with static config; tests pin exact equality against
scipy.signal.stft/istft and torch.stft/istft round-trips.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (matches scipy get_window('hann') / torch.hann_window)."""
    k = np.arange(n)
    return jnp.asarray(0.5 - 0.5 * np.cos(2.0 * np.pi * k / n), dtype=dtype)


@dataclass(frozen=True)
class StftConfig:
    n_fft: int
    hop: int
    # 'zeros'  -> scipy-style: pad n_fft//2 zeros both ends, then pad the end
    #             so the signal tiles into whole frames
    # 'reflect'-> torch-style center padding (n_fft//2 reflect both ends)
    # 'none'   -> no padding; only complete frames are taken
    pad_mode: str = "reflect"
    # Forward scale applied to the complex STFT. scipy uses 1/sum(win),
    # torch uses 1.0.
    scale: float = 1.0
    backend: str = "matmul"  # 'matmul' (MXU) | 'fft'

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1


def scipy_stft_config(nperseg: int, noverlap: int, backend: str = "matmul") -> StftConfig:
    """Config equivalent to scipy.signal.stft(x, fs, nperseg, noverlap)."""
    win_sum = float(np.sum(0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(nperseg) / nperseg)))
    return StftConfig(n_fft=nperseg, hop=nperseg - noverlap, pad_mode="zeros",
                      scale=1.0 / win_sum, backend=backend)


def torch_stft_config(n_fft: int, hop: int, backend: str = "matmul") -> StftConfig:
    """Config equivalent to torch.stft(x, n_fft, hop, window=hann, center=True)."""
    return StftConfig(n_fft=n_fft, hop=hop, pad_mode="reflect", scale=1.0,
                      backend=backend)


@functools.lru_cache(maxsize=16)
def _dft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT basis: rfft(s)[k] = s @ C[:, k] - i * s @ S[:, k]."""
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    # float64 tables cast down once: keeps basis accurate to f32 round-off.
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _idft_matrices(n_fft: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse basis: irfft(Z)[n] = Re(Z) @ Ci[:, n] + Im(Z) @ Si[:, n],
    where Si carries the negative sign of the hermitian expansion
    (s_n = (1/N) Σ_k w_k (Re Z_k cos θ − Im Z_k sin θ), θ = 2πkn/N)."""
    n_bins = n_fft // 2 + 1
    k = np.arange(n_bins)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    w = np.full((n_bins, 1), 2.0)
    w[0] = 1.0
    if n_fft % 2 == 0:
        w[-1] = 1.0
    ci = (w * np.cos(ang) / n_fft).astype(np.float32)
    si = (-w * np.sin(ang) / n_fft).astype(np.float32)
    return ci, si


def _pad_signal(x: jax.Array, cfg: StftConfig) -> jax.Array:
    half = cfg.n_fft // 2
    if cfg.pad_mode == "reflect":
        return jnp.pad(x, (half, half), mode="reflect")
    if cfg.pad_mode == "zeros":
        x = jnp.pad(x, (half, half))
        # scipy padded=True: extend so (len - n_fft) % hop == 0
        rem = (x.shape[0] - cfg.n_fft) % cfg.hop
        if rem:
            x = jnp.pad(x, (0, cfg.hop - rem))
        return x
    if cfg.pad_mode == "none":
        return x
    raise ValueError(f"unknown pad_mode {cfg.pad_mode!r}")


def frame_signal(x: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """Strided framing -> (n_frames, frame_len). Static shapes.

    When hop divides frame_len (every config here: ratio 4), the signal is
    viewed as (rows, hop) chunks and each frame is ``r`` consecutive rows —
    so framing is a stack of ``r`` shifted row slices: pure reshape/slice,
    no gather. The general gather path is kept as fallback; it measured
    12.6 ms/clip on a v5e (one giant gather fusion was 99% of the stft's
    device time) vs ~0.1 ms for the row view.
    """
    n_frames = 1 + (x.shape[0] - frame_len) // hop
    if n_frames < 1:
        # a negative n_frames would silently mis-slice the fast path below
        # (frames[:-k] returns wrong-count frames, no error downstream)
        raise ValueError(
            f"signal of {x.shape[0]} samples is shorter than one "
            f"{frame_len}-sample frame; pad it (see StftConfig.pad_mode)")
    if frame_len % hop == 0:
        r = frame_len // hop
        pad = (-x.shape[0]) % hop
        rows = jnp.pad(x, (0, pad)).reshape(-1, hop)
        m = rows.shape[0]
        frames = jnp.stack([rows[j:m - (r - 1) + j] for j in range(r)],
                           axis=1).reshape(-1, frame_len)
        return frames[:n_frames]
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]
    return x[jnp.asarray(idx)]


def overlap_add(frames: jax.Array, hop: int, length: int) -> jax.Array:
    """Overlap-add of (n_frames, frame_len) frames at stride ``hop``.

    When hop divides frame_len (every config in this framework: ratio 4), the
    scatter is rewritten as R= frame_len/hop shifted dense adds — pure
    reshapes + adds, no scatter op, VPU-friendly. Falls back to XLA scatter
    otherwise.
    """
    n_frames, frame_len = frames.shape
    total = (n_frames - 1) * hop + frame_len
    if frame_len % hop == 0:
        r = frame_len // hop
        chunks = frames.reshape(n_frames, r, hop)
        acc = jnp.zeros((n_frames + r - 1, hop), dtype=frames.dtype)
        for j in range(r):
            acc = acc.at[j : j + n_frames].add(chunks[:, j, :])
        out = acc.reshape(-1)
    else:  # pragma: no cover - no current config hits this
        idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :]).reshape(-1)
        out = jnp.zeros(total, dtype=frames.dtype).at[jnp.asarray(idx)].add(frames.reshape(-1))
    return out[:length] if length is not None else out


@functools.partial(jax.jit, static_argnums=(1,))
def stft(x: jax.Array, cfg: StftConfig) -> jax.Array:
    """STFT -> complex64 (n_bins, n_frames), the reference's orientation."""
    x = x.astype(jnp.float32)
    xp = _pad_signal(x, cfg)
    frames = frame_signal(xp, cfg.n_fft, cfg.hop)
    win = hann_window(cfg.n_fft)
    fw = frames * win[None, :]
    if cfg.backend == "matmul":
        # Precision.HIGH (3-pass bf16): the MXU's 1-pass f32 default loses
        # ~9 bits on the DFT basis contraction (measured 54 dB roundtrip on a
        # v5e vs 129 dB on CPU); HIGH restores >100 dB and measured *faster*
        # than DEFAULT at these sizes (0.03 ms vs 0.15 ms per 10 s clip).
        prec = jax.lax.Precision.HIGH
        cos_m, sin_m = _dft_matrices(cfg.n_fft)
        re = jnp.dot(fw, jnp.asarray(cos_m), preferred_element_type=jnp.float32,
                     precision=prec)
        im = -jnp.dot(fw, jnp.asarray(sin_m), preferred_element_type=jnp.float32,
                      precision=prec)
        z = jax.lax.complex(re, im)
    else:
        z = jnp.fft.rfft(fw, axis=-1)
    return (z * cfg.scale).T


@functools.partial(jax.jit, static_argnums=(1, 2))
def istft(z: jax.Array, cfg: StftConfig, length: int) -> jax.Array:
    """iSTFT of (n_bins, n_frames) back to a length-``length`` signal.

    Matches scipy.signal.istft (pad_mode='zeros') / torch.istft
    (pad_mode='reflect'): windowed overlap-add normalized by the OLA of the
    squared window, then boundary trim + cut to ``length``.
    """
    z = z.T / cfg.scale  # (n_frames, n_bins)
    if cfg.backend == "matmul":
        prec = jax.lax.Precision.HIGH
        ci, si = _idft_matrices(cfg.n_fft)
        frames = (
            jnp.dot(jnp.real(z), jnp.asarray(ci), preferred_element_type=jnp.float32,
                    precision=prec)
            + jnp.dot(jnp.imag(z), jnp.asarray(si), preferred_element_type=jnp.float32,
                      precision=prec)
        )
    else:
        frames = jnp.fft.irfft(z, n=cfg.n_fft, axis=-1)
    win = hann_window(cfg.n_fft)
    num = overlap_add(frames * win[None, :], cfg.hop, None)
    den = overlap_add(
        jnp.broadcast_to(win * win, (frames.shape[0], cfg.n_fft)), cfg.hop, None
    )
    sig = num / jnp.where(den > 1e-11, den, 1.0)
    half = cfg.n_fft // 2 if cfg.pad_mode in ("reflect", "zeros") else 0
    sig = sig[half:]
    if sig.shape[0] >= length:
        return sig[:length]
    return jnp.pad(sig, (0, length - sig.shape[0]))


def magphase(z: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Split complex STFT into (magnitude, phase)."""
    return jnp.abs(z), jnp.angle(z)


def polar(mag: jax.Array, phase: jax.Array) -> jax.Array:
    """Recombine magnitude and phase -> complex (torch.polar equivalent)."""
    return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))


def power_spectrogram(x: jax.Array, n_fft: int, hop: int, power: float = 2.0) -> jax.Array:
    """torchaudio.transforms.Spectrogram equivalent (center reflect pad, no scale).

    Used by the diffusion pipeline's wav->spectrogram codec
    (reference main_diffusion_gap.py:22-27).
    """
    z = stft(x, torch_stft_config(n_fft, hop))
    return jnp.abs(z) ** power

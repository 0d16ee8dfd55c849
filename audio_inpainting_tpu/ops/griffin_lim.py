"""Griffin-Lim phase reconstruction as a jitted lax.fori_loop.

Behavioral equivalent of ``torchaudio.transforms.GriffinLim(n_fft=2048,
hop_length=512, power=1.0)`` used by the diffusion pipeline
(reference main_diffusion_gap.py:73-74): 32 iterations, momentum 0.99,
random phase init.

Each iteration is one iSTFT + STFT. The naive composition materializes the
waveform, crops it, reflect-pads it, and re-frames it with a sample-level
gather — every iteration. The fused body used here keeps the round trip in
frame/row space: the overlap-add output is viewed as (rows, hop) chunks, the
re-framing becomes a stack of 4 shifted row slices (n_fft/hop = 4), and the
OLA window-energy normalizer — loop-invariant — is hoisted out of the loop.
Numerics are bit-identical to the istft∘stft composition (same op order;
asserted in tests/test_stft.py); the unfused body remains as the fallback
for configs the row view cannot express.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .stft import (StftConfig, _dft_matrices, _idft_matrices, frame_signal,
                   hann_window, istft, overlap_add, polar, stft,
                   torch_stft_config)

_PREC = jax.lax.Precision.HIGH  # same rationale as ops/stft.py matmuls


def _fused_ok(cfg: StftConfig, length: int, n_frames: int) -> bool:
    """The row-space round trip covers exactly the production configs:
    reflect padding, matmul backend, hop | n_fft, a crop that the OLA extent
    covers, and enough output frames to refill the input spectrogram."""
    if cfg.pad_mode != "reflect" or cfg.backend != "matmul":
        return False
    if cfg.n_fft % cfg.hop:
        return False
    if length < cfg.n_fft // 2 + 1:            # reflect slice c[1:half+1]
        return False                           # needs half+1 samples
    r = cfg.n_fft // cfg.hop
    avail = (n_frames + r - 1) * cfg.hop - cfg.n_fft // 2
    if avail < length:                         # istft would zero-pad the tail
        return False
    return 1 + length // cfg.hop >= n_frames   # stft(istft) keeps >= F frames


def _iter_fused(z: jax.Array, cfg: StftConfig, length: int, win: jax.Array,
                den_safe: jax.Array) -> jax.Array:
    """stft(istft(z, cfg, length), cfg) without leaving frame/row space."""
    n_fft, hop = cfg.n_fft, cfg.hop
    half = n_fft // 2
    n_frames = z.shape[1]

    # --- iSTFT: two matmuls + windowed overlap-add (ops/stft.py:171) ------
    zt = z.T / cfg.scale
    ci, si = _idft_matrices(n_fft)
    frames = (
        jnp.dot(jnp.real(zt), jnp.asarray(ci),
                preferred_element_type=jnp.float32, precision=_PREC)
        + jnp.dot(jnp.imag(zt), jnp.asarray(si),
                  preferred_element_type=jnp.float32, precision=_PREC)
    )
    num = overlap_add(frames * win[None, :], hop, None)  # (n_frames+r-1)*hop
    sig = num / den_safe                                 # den hoisted: const
    c = sig[half:half + length]

    # --- reflect pad + re-frame (stft.frame_signal's row-slice fast path) -
    xp = jnp.concatenate(
        [jnp.flip(c[1:half + 1]), c, jnp.flip(c[-half - 1:-1])])

    # --- STFT: window + two matmuls (ops/stft.py:146) ---------------------
    fw = frame_signal(xp, n_fft, hop) * win[None, :]
    cos_m, sin_m = _dft_matrices(n_fft)
    re = jnp.dot(fw, jnp.asarray(cos_m),
                 preferred_element_type=jnp.float32, precision=_PREC)
    im = -jnp.dot(fw, jnp.asarray(sin_m),
                  preferred_element_type=jnp.float32, precision=_PREC)
    zz = jax.lax.complex(re, im) * cfg.scale
    return zz.T[:, :n_frames]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _griffin_lim(mag: jax.Array, key: jax.Array, cfg: StftConfig, length: int,
                 n_iter: int, momentum: float) -> jax.Array:
    init_phase = jax.random.uniform(key, mag.shape, minval=-jnp.pi, maxval=jnp.pi)
    z0 = polar(mag, init_phase)
    fused = _fused_ok(cfg, length, mag.shape[1])
    if fused:
        win = hann_window(cfg.n_fft)
        den = overlap_add(
            jnp.broadcast_to(win * win, (mag.shape[1], cfg.n_fft)),
            cfg.hop, None)
        den_safe = jnp.where(den > 1e-11, den, 1.0)

    def body(_, carry):
        z, prev = carry
        # rebuild with current phase estimate, momentum-accelerated
        if fused:
            rebuilt = _iter_fused(z, cfg, length, win, den_safe)
        else:
            inv = istft(z, cfg, length)
            rebuilt = stft(inv, cfg)
            # guard against shape drift from padding: crop to mag's frames
            rebuilt = rebuilt[:, : mag.shape[1]]
        tprev = rebuilt
        rebuilt = rebuilt - (momentum / (1.0 + momentum)) * prev
        angle = rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-16)
        return mag * angle, tprev

    z, _ = jax.lax.fori_loop(0, n_iter, body, (z0, jnp.zeros_like(z0)))
    return istft(z, cfg, length)


def griffin_lim(mag, n_fft: int = 2048, hop: int = 512, n_iter: int = 32,
                momentum: float = 0.99, length: int | None = None,
                power: float = 1.0, seed: int = 0) -> jax.Array:
    """Reconstruct a waveform from a (n_bins, n_frames) magnitude spectrogram.

    ``power``: exponent of the input spectrogram; 1.0 means ``mag`` is already
    linear magnitude (the diffusion codec's convention).
    """
    mag = jnp.asarray(mag, dtype=jnp.float32)
    if power != 1.0:
        mag = mag ** (1.0 / power)
    if length is None:
        length = hop * (mag.shape[1] - 1)
    cfg = torch_stft_config(n_fft, hop)
    key = jax.random.PRNGKey(seed)
    return _griffin_lim(mag, key, cfg, int(length), int(n_iter), float(momentum))

"""Spatial (sequence) model parallelism: shard the time axis across chips.

A 10 s clip is a (F=516, T=1724) spectrogram; longer material (concert
recordings, broadcast archives) scales T far past one chip's VMEM-friendly
working set. This module trains the shared inpainting U-Net with the batch
SHARDED ALONG T over a ``tp`` mesh axis (optionally combined with ``dp``
over clips). The TPU-idiomatic mechanism (SURVEY.md §5.8): annotate the
input sharding and let XLA's SPMD partitioner insert the conv halo
exchanges and gradient all-reduces over ICI — no hand-written collectives,
same jitted train step as the single-chip path.

Also provides a frame-parallel STFT: the framing matmul-DFT is independent
per frame, so sharding the frame axis makes the transform embarrassingly
parallel (each chip DFTs its local frames; no cross-chip traffic at all).

The driver's multichip dryrun exercises this module on a virtual dp x tp
CPU mesh (__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet import SimpleUNet
from ..ops.stft import StftConfig, _pad_signal, frame_signal, hann_window
from .train import init_shared_unet, shared_unet_train_step


def make_mesh_2d(n_dp: int, n_tp: int) -> Mesh:
    devs = np.array(jax.devices()[:n_dp * n_tp]).reshape(n_dp, n_tp)
    return Mesh(devs, ("dp", "tp"))


def shard_spatial(x: jax.Array, mesh: Mesh) -> jax.Array:
    """(B, F, T, C): B over dp, T over tp. T must divide by the tp size."""
    return jax.device_put(x, NamedSharding(mesh, P("dp", None, "tp", None)))


def fit_shared_unet_spatial(batch, target, mask, mesh: Mesh,
                            steps: int = 100, key: jax.Array | int = 0):
    """Same training semantics as parallel.train.fit_shared_unet, but with
    the time axis model-parallel over ``tp``. XLA partitions every conv
    spatially (halo exchange on the T boundaries) and all-reduces the
    gradients; the train step function is byte-identical to the dp one.
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    batch = shard_spatial(jnp.asarray(batch, jnp.float32), mesh)
    target = shard_spatial(jnp.asarray(target, jnp.float32), mesh)
    mask = shard_spatial(jnp.asarray(mask, jnp.float32), mesh)
    params, opt_state = init_shared_unet(key, batch.shape[1], batch.shape[2])
    params = jax.device_put(params, NamedSharding(mesh, P()))
    opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
    loss = None
    for _ in range(steps):
        params, opt_state, loss = shared_unet_train_step(
            params, opt_state, batch, target, mask)
    return params, float(loss)


def predict_spatial(params, batch, mesh: Mesh) -> jax.Array:
    """Sharded forward pass of the shared U-Net (inference path)."""
    batch = shard_spatial(jnp.asarray(batch, jnp.float32), mesh)

    @jax.jit
    def fwd(p, x):
        return SimpleUNet().apply({"params": p}, x)

    return fwd(jax.device_put(params, NamedSharding(mesh, P())), batch)


def stft_frame_parallel(x: jax.Array, cfg: StftConfig, mesh: Mesh,
                        axis: str = "tp"):
    """STFT with the frame axis sharded over ``axis``.

    Framing happens once (cheap gather), then each chip multiplies its local
    frames by the replicated DFT matrices — zero collectives. Returns
    (re, im) each (frames, bins) sharded along frames; matches
    ``ops.stft.stft`` transposed (which returns (bins, frames)).
    """
    xp = _pad_signal(jnp.asarray(x, jnp.float32), cfg)
    frames = frame_signal(xp, cfg.n_fft, cfg.hop)   # (n_frames, n_fft)
    n = frames.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    frames = jnp.pad(frames, ((0, pad), (0, 0)))
    frames = jax.device_put(frames, NamedSharding(mesh, P(axis, None)))
    win = hann_window(cfg.n_fft)
    t = np.arange(cfg.n_fft)
    f = np.arange(cfg.n_fft // 2 + 1)
    ang = 2.0 * np.pi * np.outer(t, f) / cfg.n_fft
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    scale = jnp.float32(cfg.scale)

    @jax.jit
    def dft(fr):
        fw = fr * win[None, :]
        return (scale * jnp.dot(fw, cos, precision=jax.lax.Precision.HIGHEST),
                scale * jnp.dot(fw, -sin, precision=jax.lax.Precision.HIGHEST))

    re, im = dft(frames)
    return re[:n], im[:n]

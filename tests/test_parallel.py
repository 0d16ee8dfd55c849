"""Multi-chip path on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from audio_inpainting_tpu.parallel import make_mesh, fit_shared_unet, shard_batch


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    x = jnp.zeros((8, 4, 4, 1))
    xs = shard_batch(x, mesh)
    assert len(xs.sharding.device_set) == 8


def test_shared_unet_dp_training_step_runs_and_learns():
    mesh = make_mesh()
    rng = np.random.RandomState(0)
    tgt = rng.rand(8, 16, 32, 1).astype(np.float32)
    msk = np.ones_like(tgt)
    msk[:, :, 10:20, :] = 0.0
    inp = tgt * msk
    params, loss = fit_shared_unet(inp, tgt, msk, mesh, steps=30)
    assert np.isfinite(loss)


def test_graft_entry_contract():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 516, 1728, 1)
    ge.dryrun_multichip(8)


def test_spatial_sharded_forward_matches_single_device():
    """T-axis model parallelism must be bit-compatible with the single-chip
    forward (XLA inserts the conv halo exchanges from the sharding alone)."""
    from audio_inpainting_tpu.parallel import make_mesh_2d, predict_spatial
    from audio_inpainting_tpu.parallel.train import init_shared_unet

    rng = np.random.RandomState(1)
    x = rng.rand(2, 16, 64, 1).astype(np.float32)
    params, _ = init_shared_unet(jax.random.PRNGKey(0), 16, 64)
    from audio_inpainting_tpu.models.unet import SimpleUNet

    ref = SimpleUNet().apply({"params": params}, jnp.asarray(x))
    mesh = make_mesh_2d(2, 4)
    out = predict_spatial(params, x, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_training_runs_on_dp_x_tp_mesh():
    from audio_inpainting_tpu.parallel import (fit_shared_unet_spatial,
                                               make_mesh_2d)

    mesh = make_mesh_2d(2, 4)
    rng = np.random.RandomState(2)
    tgt = rng.rand(2, 16, 32, 1).astype(np.float32)
    msk = np.ones_like(tgt)
    msk[:, :, 12:20, :] = 0.0
    params, loss = fit_shared_unet_spatial(tgt * msk, tgt, msk, mesh,
                                           steps=10)
    assert np.isfinite(loss)


def test_stft_frame_parallel_matches_reference():
    from audio_inpainting_tpu.ops import torch_stft_config, stft
    from audio_inpainting_tpu.parallel import make_mesh_2d, stft_frame_parallel

    rng = np.random.RandomState(3)
    x = rng.randn(44100).astype(np.float32)
    cfg = torch_stft_config(1024, 256)
    z = np.asarray(stft(jnp.asarray(x), cfg))   # (bins, frames)
    mesh = make_mesh_2d(2, 4)
    re, im = stft_frame_parallel(x, cfg, mesh)
    np.testing.assert_allclose(np.asarray(re).T, z.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im).T, z.imag, atol=2e-3)

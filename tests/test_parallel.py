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
    assert out.shape == (1, 516, 1724, 1)
    ge.dryrun_multichip(8)

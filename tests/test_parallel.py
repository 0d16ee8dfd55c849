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


# The packed-flagship mesh equivalences run in a FRESH subprocess: this
# jaxlib's CPU client intermittently SEGFAULTS in backend_compile_and_load
# when compiling these 8-device SPMD programs inside a long-lived process
# that has already compiled dozens of other programs (each program passes
# in a fresh process; tests/test_parallel.py alone is green, the full
# suite crashed here 3/3 runs). Same isolation pattern as
# __graft_entry__.dryrun_multichip. See docs/DESIGN.md round-3 infra note.
_PACKED_EQUIV_SCRIPT = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

from audio_inpainting_tpu.parallel import (
    fit_packed_unet_dp, fit_packed_unet_single, fit_packed_unet_spatial,
    make_mesh, make_mesh_2d)

rng = np.random.RandomState(3)
b, f, t = 8, 8, 64
batch = rng.rand(b, f, t, 1).astype("float32")
target = rng.rand(b, f, t, 1).astype("float32")
mask = (rng.rand(b, f, t, 1) > 0.3).astype("float32")
_, dp1 = fit_packed_unet_single(batch, target, mask, steps=3)
_, dp8 = fit_packed_unet_dp(batch, target, mask, make_mesh(8), steps=3)

rng = np.random.RandomState(4)
b, f, t = 4, 8, 128  # t/tp = 64 per shard (divides 32)
batch = rng.rand(b, f, t, 1).astype("float32")
target = rng.rand(b, f, t, 1).astype("float32")
mask = (rng.rand(b, f, t, 1) > 0.3).astype("float32")
_, tp1 = fit_packed_unet_single(batch, target, mask, steps=3)
_, tp2 = fit_packed_unet_spatial(batch, target, mask, make_mesh_2d(4, 2),
                                 steps=3)
print(json.dumps({"dp": [dp1, dp8], "tp": [tp1, tp2]}))
"""


def test_packed_flagship_mesh_equivalence():
    """The production lane-packed U-Net trains identically on a dp mesh,
    and under T-axis sharding where the band gather's neighbor-block column
    reads (ops/packedconv.py:_gather_xb) cross the shard boundary, forcing
    an SPMD halo exchange."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run([sys.executable, "-c", _PACKED_EQUIV_SCRIPT],
                         capture_output=True, text=True, env=env, cwd=repo,
                         timeout=1200)
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert abs(res["dp"][1] - res["dp"][0]) < 1e-6, res["dp"]
    assert abs(res["tp"][1] - res["tp"][0]) < 1e-6, res["tp"]


def test_ar_windows_dp_matches_meshless():
    """Mode 6 (parallel/engines.py): the windowed AR batch sharded over dp
    must produce the meshless ar_restore_gaps_windows result exactly —
    there is no cross-window math, and the texture key is folded per pass
    identically on every shard."""
    import numpy as np

    from audio_inpainting_tpu.methods.ar import (ARConfig,
                                                 ar_restore_gaps_windows)
    from audio_inpainting_tpu.parallel import make_mesh
    from audio_inpainting_tpu.parallel.engines import ar_restore_windows_dp

    mesh = make_mesh(4)
    acfg = ARConfig(order=8, context_len=64, texture=True, passes=2)
    wlen = 1024
    t = np.arange(wlen, dtype=np.float32)
    n_w = 6                                    # non-divisor: exercises padding
    wins = np.stack([(0.5 * np.sin(2 * np.pi * (3 + i) * t / wlen)
                      ).astype(np.float32) for i in range(n_w)])
    gaps = []
    for i in range(n_w):
        s = 300 + 29 * i
        wins[i, s:s + 110] = 0.0
        gaps.append([(s, s + 110)])
    out_m = np.asarray(ar_restore_windows_dp(wins, gaps, acfg, mesh, key=3))
    out_1 = np.asarray(ar_restore_gaps_windows(wins, gaps, acfg, key=3))
    assert out_m.shape == wins.shape
    np.testing.assert_allclose(out_m, out_1, atol=1e-5)
    for i, ((s, e),) in enumerate(gaps):
        assert np.abs(out_m[i, s:e]).max() > 1e-4


def test_gp_restarts_dp_matches_meshless():
    """Mode 7: GP restart fitting sharded over dp reproduces the
    single-device posterior (same restarts, same winner; per-shard vmap
    width reorders reductions — ulp-scale only)."""
    import numpy as np

    from audio_inpainting_tpu.methods.gp import GPConfig, gp_fit_predict
    from audio_inpainting_tpu.parallel import make_mesh
    from audio_inpainting_tpu.parallel.engines import gp_fit_predict_mesh

    mesh = make_mesh(4)
    cfg = GPConfig(n_restarts=5, opt_steps=4, fit_chunk=2, fit_subsample=1)
    rng = np.random.RandomState(0)
    x = np.linspace(0.0, 0.02, 160).astype(np.float32)
    y = (np.sin(2 * np.pi * 400 * x) + 0.05 * rng.randn(160)).astype(
        np.float32)
    keep = np.ones(160, bool)
    keep[60:90] = False
    mu_m, sd_m, _ = gp_fit_predict_mesh(x[keep], y[keep], x[~keep], cfg,
                                        mesh, key=1)
    mu_1, sd_1, _ = gp_fit_predict(x[keep], y[keep], x[~keep], cfg, key=1)
    np.testing.assert_allclose(np.asarray(mu_m), np.asarray(mu_1), atol=5e-5)
    np.testing.assert_allclose(np.asarray(sd_m), np.asarray(sd_1), atol=5e-5)

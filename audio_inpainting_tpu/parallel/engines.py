"""Mesh modes for the NON-neural serving engines (VERDICT r4 #6).

The neural engines already scale over device meshes (parallel/batch.py,
gan_batch.py, train.py, packed.py); this module extends the same story to
the classical ones:

- ``ar_restore_windows_dp``: the windowed AR batch
  (methods.ar.ar_restore_gaps_windows — one vmapped fused
  fit+extrapolate+paste program over same-bucket windows) with the WINDOW
  axis sharded over the mesh's dp axis via ``jax.shard_map``. There is no
  cross-window math, so the sharded result must match the meshless one
  (pinned in __graft_entry__.dryrun_multichip mode 6 and tests); the win is
  per-chip memory and wall when a long damaged file yields many windows.

- ``gp_fit_predict_mesh``: GP hyperparameter fitting with the RESTART
  batch sharded over dp — each device runs the vmapped L-BFGS-on-Cholesky
  program (methods/gp.py) on its restart slice, the winning restart is
  reduced with one tiny gather, and the posterior solve runs once on the
  winner. Restarts are the GP's whole cost (the posterior is 25 ms,
  BASELINE.md), so dp over restarts is the natural mesh axis; numerically
  equivalent to the single-device fit because every restart's trajectory
  is independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..methods.ar import ARConfig, _restore_windows_fused, windows_prep
from ..methods.gp import (GPConfig, _fit_chunk, _init_restarts, _predict,
                          _transforms)


# ------------------------------------------------------------- AR over dp --


@functools.lru_cache(maxsize=16)
def _ar_windows_fn(mesh: Mesh, cfg: ARConfig, max_len: int, gpad: int):
    def body(sig, st, en, key):
        out = sig
        for p in range(cfg.passes):
            # key folded per pass exactly like the meshless engine: every
            # window (on every shard) draws the texture noise the
            # sequential per-window path draws with the same seed
            out = _restore_windows_fused.__wrapped__(
                out, st, en, jax.random.fold_in(key[0], p), cfg, max_len,
                gpad)
        return out

    return jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P("dp"), P("dp"), P("dp"), P()),
        out_specs=P("dp")))


def ar_restore_windows_dp(signals, gaps_list, cfg: ARConfig, mesh: Mesh,
                          key: jax.Array | int = 0) -> jax.Array:
    """ar_restore_gaps_windows with windows sharded over the mesh's dp
    axis. Same single-bucket contract; the window count is padded to a
    multiple of the mesh size by repeating the last window (its outputs
    are dropped). Returns (W, n) restored windows."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    signals = jnp.asarray(signals, jnp.float32)
    cfg, starts, ends, gpad, max_len = windows_prep(gaps_list, cfg)
    W = signals.shape[0]
    n_dev = mesh.devices.size
    pad = (-W) % n_dev

    def _pad(a):
        return np.concatenate([a, np.repeat(a[-1:], pad, 0)]) if pad else a

    fn = _ar_windows_fn(mesh, cfg, max_len, gpad)
    out = fn(jnp.asarray(_pad(np.asarray(signals))),
             jnp.asarray(_pad(starts)), jnp.asarray(_pad(ends)), key[None])
    return out[:W]


# ------------------------------------------------- GP restarts over dp -----


def gp_fit_predict_mesh(x_train, y_train, x_test,
                        cfg: GPConfig = GPConfig(), mesh: Mesh | None = None,
                        key: jax.Array | int = 0):
    """gp_fit_predict with the restart batch sharded over the mesh.

    Semantics identical to methods.gp.gp_fit_predict (same restarts, same
    L-BFGS trajectories, same winner; the restart batch is padded to a
    multiple of the mesh size with copies of the theta0 row, which can
    change the argmin INDEX but never the winning theta). Returns
    (mu, std, theta).
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    x_train = jnp.asarray(x_train, jnp.float32)
    y_train = jnp.asarray(y_train, jnp.float32)
    x_test = jnp.asarray(x_test, jnp.float32)
    y_mean = jnp.mean(y_train)
    y_std = jnp.maximum(jnp.std(y_train), 1e-12)
    y_n = (y_train - y_mean) / y_std
    k = max(1, int(cfg.fit_subsample))
    xf, yf = x_train[::k], y_n[::k]

    to_theta, _ = _transforms(cfg)
    us, states = _init_restarts(cfg, key)
    n_dev = 1 if mesh is None else mesh.devices.size
    pad = (-us.shape[0]) % n_dev
    if pad:
        us = jnp.concatenate([us, jnp.repeat(us[:1], pad, 0)])
        states = jax.tree_util.tree_map(
            lambda l: jnp.concatenate([l, jnp.repeat(l[:1], pad, 0)])
            if hasattr(l, "shape") and l.ndim >= 1
            and l.shape[0] == us.shape[0] - pad else l, states)

    def run(us, states):
        chunk = max(1, cfg.fit_chunk)
        losses = None
        for start in range(0, cfg.opt_steps, chunk):
            n = min(chunk, cfg.opt_steps - start)
            us, states, losses = _fit_chunk.__wrapped__(us, states, xf, yf,
                                                        cfg, n)
        if losses is None:
            _, _, losses = _fit_chunk.__wrapped__(us, states, xf, yf, cfg, 0)
        return us, losses

    if mesh is None:
        us, losses = jax.jit(run)(us, states)
    else:
        # check_vma=False: optax's zoom linesearch carries lax.cond state
        # whose varying-axis types trip shard_map's replication analysis;
        # the body is purely local per-restart math (no collectives), so
        # the check adds nothing here
        us, losses = jax.jit(jax.shard_map(
            run, mesh=mesh, in_specs=(P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")), check_vma=False))(us, states)
    losses = jnp.where(jnp.isfinite(losses), losses, jnp.inf)
    theta = to_theta(us[jnp.argmin(losses)])
    mu, std = _predict(theta, x_train, y_n, x_test, cfg)
    return mu * y_std + y_mean, std * y_std, theta

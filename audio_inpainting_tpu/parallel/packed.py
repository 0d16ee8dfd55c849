"""Mesh execution of the PRODUCTION lane-packed models.

Rounds 1-2 mesh-exercised only the standard ``SimpleUNet``; the flagship
``PackedSimpleUNet`` (models/packed_unet.py — the path ``__graft_entry__.
entry()`` ships and methods.neural trains) was never placed on a mesh. Its
W-packed layout is the interesting case for SPMD: the band conv reads the
NEIGHBOR packed block's boundary columns (ops/packedconv.py:_gather_xb), so
sharding the time axis splits exactly along those reads and XLA's SPMD
partitioner must insert a halo exchange (collective-permute of one boundary
column per shard) — the packed twin of the standard conv's spatial halo.

Two modes, mirroring parallel/train.py and parallel/spatial.py:

- ``fit_packed_unet_dp``: shared packed U-Net, clip batch over ``dp``,
  params replicated, gradient all-reduce inserted by XLA.
- ``fit_packed_unet_spatial``: dp x tp mesh, the spectrogram T axis sharded
  over ``tp``. T must divide by 32 * tp (the lane packing times the two 2x
  pools, per shard). The pack() reshape W -> (W/8, 8*C) splits along the
  shard boundary, so each chip packs its local frames; the band-edge reads
  become the halo exchange.

The driver dryrun (__graft_entry__._dryrun_body) asserts these produce the
SAME loss/params as single-device execution — not just finiteness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.packed_unet import PackedSimpleUNet
from .mesh import shard_batch
from .spatial import shard_spatial

_TX = optax.adam(1e-3)


def init_packed_unet(key: jax.Array, f: int, t: int):
    model = PackedSimpleUNet()
    params = model.init(key, jnp.zeros((1, f, t, 1)))["params"]
    return params, _TX.init(params)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def packed_unet_train_step(params, opt_state, batch, target, mask):
    """One masked-MSE Adam step of the packed flagship on a (B, F, T, 1)
    batch (F % 4 == 0, T % 32 == 0). Sharding comes entirely from the
    operands — the same jitted step serves 1-device and any mesh layout."""
    model = PackedSimpleUNet()

    def loss_fn(p):
        out = model.apply({"params": p}, batch)
        inv = 1.0 - mask
        return jnp.mean((out * inv - target * inv) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = _TX.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def _fit(batch, target, mask, place, params, opt_state, steps):
    batch, target, mask = place(batch), place(target), place(mask)
    loss = None
    for _ in range(steps):
        params, opt_state, loss = packed_unet_train_step(
            params, opt_state, batch, target, mask)
    return params, float(loss)


def fit_packed_unet_dp(batch, target, mask, mesh: Mesh, steps: int = 10,
                       key: jax.Array | int = 0):
    """Shared packed U-Net, batch sharded over dp, params replicated."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    batch = jnp.asarray(batch, jnp.float32)
    params, opt_state = init_packed_unet(key, batch.shape[1], batch.shape[2])
    params = jax.device_put(params, NamedSharding(mesh, P()))
    opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
    return _fit(batch, jnp.asarray(target, jnp.float32),
                jnp.asarray(mask, jnp.float32),
                lambda x: shard_batch(x, mesh), params, opt_state, steps)


def fit_packed_unet_spatial(batch, target, mask, mesh: Mesh, steps: int = 10,
                            key: jax.Array | int = 0):
    """Packed flagship with B over dp and T over tp (halo-exchange mode)."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    batch = jnp.asarray(batch, jnp.float32)
    t_local = batch.shape[2] // mesh.shape["tp"]
    assert t_local % 32 == 0, (
        f"per-shard T must divide 32 (8-lane packing x two pools), got "
        f"{t_local}")
    params, opt_state = init_packed_unet(key, batch.shape[1], batch.shape[2])
    params = jax.device_put(params, NamedSharding(mesh, P()))
    opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
    return _fit(batch, jnp.asarray(target, jnp.float32),
                jnp.asarray(mask, jnp.float32),
                lambda x: shard_spatial(x, mesh), params, opt_state, steps)


def fit_packed_unet_single(batch, target, mask, steps: int = 10,
                           key: jax.Array | int = 0):
    """Single-device twin (no sharding) — the dryrun's equivalence oracle."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    batch = jnp.asarray(batch, jnp.float32)
    params, opt_state = init_packed_unet(key, batch.shape[1], batch.shape[2])
    return _fit(batch, jnp.asarray(target, jnp.float32),
                jnp.asarray(mask, jnp.float32),
                lambda x: jax.device_put(x, jax.devices()[0]),
                params, opt_state, steps)

"""Batched multi-clip restoration: N clips in the wall-clock of one.

The reference restores exactly one clip per process. Production serving
wants a corpus: this module trains one INDEPENDENT U-Net per clip (the
reference's per-clip-overfit semantics) for a whole batch at once, sharding
clips over the mesh's dp axis with ``jax.shard_map`` — each device trains
its local clips, zero cross-chip traffic (embarrassingly parallel, unlike
parallel/train.py's shared-model all-reduce mode).

Inside each shard the clips run under ``lax.map`` (sequential per device):
vmapping over per-clip conv kernels would lower to grouped convolutions,
which XLA rejects for the 1-channel output head — map keeps each clip's
convs ordinary while the mesh provides the parallelism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..methods.neural import UNetTrainConfig
from ..models.unet import SimpleUNet
from .mesh import make_mesh

_MODEL = SimpleUNet()


def _local_init(keys, inp):
    def one(args):
        k, x = args
        return _MODEL.init(k, x[None])["params"]

    return jax.lax.map(one, (keys, inp))


def _local_chunk(params, opt_state, inp, tgt, msk, cfg: UNetTrainConfig,
                 n_epochs: int):
    tx = optax.adam(cfg.lr)

    def one(args):
        p, st, x, t, m = args
        inv = 1.0 - m

        def loss_fn(pp):
            out = _MODEL.apply({"params": pp}, x[None])[0]
            if cfg.masked_loss:
                return jnp.mean((out * inv - t * inv) ** 2)
            return jnp.mean((out - t) ** 2)

        def epoch(carry, _):
            pp, sst = carry
            loss, g = jax.value_and_grad(loss_fn)(pp)
            upd, sst = tx.update(g, sst, pp)
            return (optax.apply_updates(pp, upd), sst), loss

        (p, st), losses = jax.lax.scan(epoch, (p, st), None, length=n_epochs)
        return p, st, losses[-1]

    return jax.lax.map(one, (params, opt_state, inp, tgt, msk))


def _local_composite(params, inp, msk):
    def one(args):
        p, x, m = args
        pred = _MODEL.apply({"params": p}, x[None])[0]
        return x + pred * (1.0 - m)

    return jax.lax.map(one, (params, inp, msk))


# Module-level jit caches: jit keys on function identity, so building these
# inside restore_clips_unet would recompile every stage on every call in a
# long-lived serving process.
@functools.lru_cache(maxsize=8)
def _init_fn(mesh: Mesh):
    return jax.jit(jax.shard_map(_local_init, mesh=mesh,
                                 in_specs=(P("dp"), P("dp")),
                                 out_specs=P("dp")))


@functools.lru_cache(maxsize=8)
def _opt_init_fn(mesh: Mesh):
    return jax.jit(jax.shard_map(
        lambda p: jax.lax.map(optax.adam(1.0).init, p),   # adam init is lr-free
        mesh=mesh, in_specs=(P("dp"),), out_specs=P("dp")))


@functools.lru_cache(maxsize=16)
def _chunk_fn(mesh: Mesh, cfg: UNetTrainConfig, n_epochs: int):
    return jax.jit(
        jax.shard_map(functools.partial(_local_chunk, cfg=cfg,
                                        n_epochs=n_epochs),
                      mesh=mesh, in_specs=(P("dp"),) * 5,
                      out_specs=(P("dp"), P("dp"), P("dp"))),
        donate_argnums=(0, 1))


@functools.lru_cache(maxsize=8)
def _comp_fn(mesh: Mesh):
    return jax.jit(jax.shard_map(_local_composite, mesh=mesh,
                                 in_specs=(P("dp"),) * 3, out_specs=P("dp")))


def restore_clips_unet(mag_norm_batch, mask_batch,
                       cfg: UNetTrainConfig = UNetTrainConfig(),
                       mesh: Mesh | None = None,
                       key: jax.Array | int = 0):
    """Restore a batch of clips' normalized magnitudes, one U-Net per clip.

    mag_norm_batch, mask_batch: (B, F, T, 1), F/T multiples of 4, B divisible
    by the mesh size. Returns (composited (B, F, T, 1), per-clip final loss).
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    if mesh is None:
        mesh = make_mesh(1)
    mag = jnp.asarray(mag_norm_batch, jnp.float32)
    msk = jnp.asarray(mask_batch, jnp.float32)
    B = mag.shape[0]
    assert B % mesh.devices.size == 0, (B, mesh.devices.size)
    inp = mag * msk
    keys = jax.random.split(key, B)

    params = _init_fn(mesh)(keys, inp)
    opt_state = _opt_init_fn(mesh)(params)

    final_loss = None
    done = 0
    while done < cfg.epochs:
        n = min(cfg.scan_chunk, cfg.epochs - done)   # never overshoot epochs
        params, opt_state, final_loss = _chunk_fn(mesh, cfg, n)(
            params, opt_state, inp, mag, msk)
        done += n

    return _comp_fn(mesh)(params, inp, msk), final_loss

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
convs ordinary while the mesh provides the parallelism. Each mapped
element calls methods.neural._unet_scan_core — the EXACT training program
of the benched single-clip path (lane-packed model, masked sum/denom
loss, flat-vector Adam), so the batched path cannot drift from it
(equivalence pinned in tests/test_batch_restore.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..methods.neural import UNetTrainConfig, _dtype, _unet_scan_core
from ..models.packed_unet import PackedSimpleUNet
from .mesh import make_mesh


def _pad4_batch(x: jax.Array, value: float) -> jax.Array:
    """(B, F, T, 1) -> (B, F4, T32, 1): F to %4, T to %32 (two pools x the
    8-wide lane packing — the same divisors as methods.neural._pad4)."""
    _, f, t, _ = x.shape
    return jnp.pad(x, ((0, 0), (0, (-f) % 4), (0, (-t) % 32), (0, 0)),
                   constant_values=value)


def _local_init(keys, inp, cfg: UNetTrainConfig):
    model = PackedSimpleUNet(dtype=_dtype(cfg))

    def one(args):
        k, x = args
        return model.init(k, x[None])["params"]

    return jax.lax.map(one, (keys, inp))


def _local_chunk(params, opt_state, inp, tgt, msk, vld,
                 cfg: UNetTrainConfig, n_epochs: int):
    def one(args):
        p, st, x, t, m, v = args
        p, st, losses = _unet_scan_core(p, st, x[None], t[None], m[None],
                                        v[None], cfg, n_epochs)
        return p, st, losses[-1]

    return jax.lax.map(one, (params, opt_state, inp, tgt, msk, vld))


def _local_composite(params, inp, msk, cfg: UNetTrainConfig):
    model = PackedSimpleUNet(dtype=_dtype(cfg))

    def one(args):
        p, x, m = args
        pred = model.apply({"params": p}, x[None])[0]
        return x + pred * (1.0 - m)

    return jax.lax.map(one, (params, inp, msk))


# Module-level jit caches: jit keys on function identity, so building these
# inside restore_clips_unet would recompile every stage on every call in a
# long-lived serving process.
@functools.lru_cache(maxsize=8)
def _init_fn(mesh: Mesh, cfg: UNetTrainConfig):
    return jax.jit(jax.shard_map(functools.partial(_local_init, cfg=cfg),
                                 mesh=mesh, in_specs=(P("dp"), P("dp")),
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
                      mesh=mesh, in_specs=(P("dp"),) * 6,
                      out_specs=(P("dp"), P("dp"), P("dp"))),
        donate_argnums=(0, 1))


@functools.lru_cache(maxsize=8)
def _comp_fn(mesh: Mesh, cfg: UNetTrainConfig):
    return jax.jit(jax.shard_map(functools.partial(_local_composite,
                                                   cfg=cfg),
                                 mesh=mesh, in_specs=(P("dp"),) * 3,
                                 out_specs=P("dp")))


def restore_clips_unet(mag_norm_batch, mask_batch,
                       cfg: UNetTrainConfig = UNetTrainConfig(),
                       mesh: Mesh | None = None,
                       key: jax.Array | int = 0,
                       valid_batch=None,
                       composite_mask_batch=None):
    """Restore a batch of clips' normalized magnitudes, one U-Net per clip.

    mag_norm_batch, mask_batch: (B, F, T, 1), any F/T — padded internally
    to the lane-packed model's divisors (F%4, T%32) and trimmed on return,
    like the single-clip unet_train_restore and the GAN twin
    (gan_batch.restore_clips_gan). B must divide by the mesh size; mask
    1 = kept. key: one PRNG key / int seed (split across clips) or a
    (B, 2) array of per-clip keys (e.g. the same key for every clip, to
    match B independent single-clip calls exactly). valid_batch (optional, same shape, 1 = real content): each
    clip's true extent when the caller pre-pads unequal lengths — pad
    cells leave the loss numerator AND denominator, matching the
    single-clip unet_train_restore semantics. composite_mask_batch
    (optional): the mask used for the final input+pred*(1-mask) composite
    when it differs from the TRAINING mask — serving trains on synthetic
    masks over intact content and composites over the real damage
    (pipelines/serve.py). Returns (composited (B, F, T, 1), per-clip final
    loss).
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    if mesh is None:
        mesh = make_mesh(1)
    key = jnp.asarray(key)
    per_clip_keys = key.ndim == 2  # (B, 2): caller-supplied per-clip keys
    mag = jnp.asarray(mag_norm_batch, jnp.float32)
    msk = jnp.asarray(mask_batch, jnp.float32)
    B, f0, t0 = mag.shape[0], mag.shape[1], mag.shape[2]
    assert B % mesh.devices.size == 0, (B, mesh.devices.size)
    # divisor padding: mag 0, mask 1 (pad = kept, excluded from the masked
    # loss), valid 0 (pad cells leave numerator AND denominator), composite
    # mask 1 (pad cells pass the input through; trimmed off below anyway)
    mag = _pad4_batch(mag, 0.0)
    msk = _pad4_batch(msk, 1.0)
    inp = mag * msk
    vld = _pad4_batch(jnp.ones((B, f0, t0, 1), jnp.float32)
                      if valid_batch is None
                      else jnp.asarray(valid_batch, jnp.float32), 0.0)
    cmsk = (msk if composite_mask_batch is None
            else _pad4_batch(jnp.asarray(composite_mask_batch, jnp.float32),
                             1.0))
    keys = key if per_clip_keys else jax.random.split(key, B)
    assert keys.shape[0] == B, (keys.shape, B)

    params = _init_fn(mesh, cfg)(keys, inp)
    opt_state = _opt_init_fn(mesh)(params)

    final_loss = None
    done = 0
    while done < cfg.epochs:
        n = min(cfg.scan_chunk, cfg.epochs - done)   # never overshoot epochs
        params, opt_state, final_loss = _chunk_fn(mesh, cfg, n)(
            params, opt_state, inp, mag, msk, vld)
        done += n

    out = _comp_fn(mesh, cfg)(params, mag * cmsk, cmsk)
    return out[:, :f0, :t0], final_loss

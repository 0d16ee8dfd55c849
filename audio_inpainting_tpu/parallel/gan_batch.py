"""Batched multi-clip GAN restoration (serving mode).

The reference's GAN (main_gan_gap.py) restores exactly one clip per process
run. This module trains one INDEPENDENT generator/discriminator pair per
clip for a whole batch at once — the production-serving complement of
parallel/batch.py's U-Net mode — sharding clips over the mesh's dp axis
with ``jax.shard_map`` (zero cross-chip traffic; embarrassingly parallel).
Inside each shard the clips run under ``lax.map`` so every clip's training
scan is the SAME program as the single-clip path: each mapped element calls
methods.neural._gan_scan_core (one G forward per epoch, D-then-G update
order, logits BCE, flat-vector Adam) with that clip's state.

The full GANTrainConfig readout contract applies per clip: ema_decay=0 is
one eval-mode forward at the end (reference main_gan_gap.py:150-153);
ema_decay>0 reads out bias-corrected EMA weights (optionally gap-column
scoped), and retry_l1>0 retrains the clips whose hole-L1 shows the
mode-collapse signature in one second batched pass with folded keys.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..methods.neural import (GANTrainConfig, _d_model, _dtype,
                              _gan_scan_core, gan_readout_fake)
from ..models.packed_unet import PackedGeneratorUNet
from .mesh import make_mesh


def _pad_batched(x: jax.Array, value: float) -> jax.Array:
    """(G, F, T) -> (G, F4, T32): F to %4, T to %32 (two pools x 8-packing)."""
    _, f, t = x.shape
    return jnp.pad(x, ((0, 0), (0, (-f) % 4), (0, (-t) % 32)),
                   constant_values=value)


def _valid_batched(g: int, f: int, t: int) -> jax.Array:
    v = jnp.zeros((g, (-f) % 4 + f, (-t) % 32 + t), jnp.float32)
    return v.at[:, :f, :t].set(1.0)


def _local_init(keys, inp, cfg: GANTrainConfig):
    g_model = PackedGeneratorUNet(dtype=_dtype(cfg))
    d_model = _d_model(cfg)
    tx = optax.adam(cfg.lr, b1=cfg.b1, b2=cfg.b2)

    def one(args):
        k, x = args
        kg, kd = jax.random.split(k)
        g = g_model.init(kg, x[None, :, :, None], True)
        d = d_model.init(kd, x[None, :, :, None], True)
        st = (g["params"], g["batch_stats"], tx.init(g["params"]),
              d["params"], d["batch_stats"], tx.init(d["params"]))
        if cfg.ema_decay > 0.0:
            st += (jax.tree_util.tree_map(jnp.zeros_like, g["params"]),)
        return st

    return jax.lax.map(one, (keys, inp))


def _local_chunk(state, inp, real, msk, vld, cfg: GANTrainConfig,
                 n_epochs: int):
    def one(args):
        st, x, r, m, v = args
        st, (dl, gl) = _gan_scan_core(
            st, x[None, :, :, None], r[None, :, :, None],
            m[None, :, :, None], v[None, :, :, None], cfg, n_epochs)
        return st, dl[-1], gl[-1]

    return jax.lax.map(one, (state, inp, real, msk, vld))


def _local_composite(state, inp, msk, vld, cfg: GANTrainConfig):
    g_model = PackedGeneratorUNet(dtype=_dtype(cfg))

    def one(args):
        st, x, m, v = args
        # readout IS methods.neural's (one shared helper, so the batched
        # path can never drift from the benched single-clip semantics)
        x4, m4, v4 = (a[None, :, :, None] for a in (x, m, v))
        fake = gan_readout_fake(
            lambda p, bs: g_model.apply({"params": p, "batch_stats": bs},
                                        x4, False),
            st, m4, v4, cfg)
        return (x4 * m4 + fake * (1.0 - m4))[0, :, :, 0]

    return jax.lax.map(one, (state, inp, msk, vld))


# jit caches key on function identity, so the jitted stage functions are
# built ONCE per (mesh, cfg[, n_epochs]) at module level — a serving process
# calling restore_clips_gan per directory batch must not recompile the GAN
# scan every call.
@functools.lru_cache(maxsize=8)
def _init_fn(mesh: Mesh, cfg: GANTrainConfig):
    return jax.jit(jax.shard_map(functools.partial(_local_init, cfg=cfg),
                                 mesh=mesh, in_specs=(P("dp"), P("dp")),
                                 out_specs=P("dp")))


@functools.lru_cache(maxsize=16)
def _chunk_fn(mesh: Mesh, cfg: GANTrainConfig, n_epochs: int):
    return jax.jit(
        jax.shard_map(functools.partial(_local_chunk, cfg=cfg,
                                        n_epochs=n_epochs),
                      mesh=mesh, in_specs=(P("dp"),) * 5,
                      out_specs=(P("dp"), P("dp"), P("dp"))),
        donate_argnums=(0,))


@functools.lru_cache(maxsize=8)
def _comp_fn(mesh: Mesh, cfg: GANTrainConfig):
    return jax.jit(jax.shard_map(functools.partial(_local_composite,
                                                   cfg=cfg),
                                 mesh=mesh, in_specs=(P("dp"),) * 4,
                                 out_specs=P("dp")))


def restore_clips_gan(norm_batch, real_batch, mask_batch,
                      cfg: GANTrainConfig = GANTrainConfig(),
                      mesh: Mesh | None = None,
                      key: jax.Array | int = 0,
                      valid_batch=None,
                      n_real: int | None = None):
    """Restore a batch of clips' [-1,1] magnitudes, one GAN pair per clip.

    norm_batch, real_batch, mask_batch: (G, F, T); mask 1 = kept. G must
    divide by the mesh size. valid_batch (optional, (G, F, T), 1 = real
    content): marks each clip's true extent when callers pre-pad unequal
    lengths — pad cells are excluded from the L1 reconstruction term and
    its denominator, matching the single-clip path's _valid4 semantics.
    n_real (optional): only the first n_real clips are REAL; the rest are
    batch-padding duplicates the caller will drop, so they never gate the
    retry_l1 mode-collapse check (a duplicate's independent bad draw must
    not trigger a retry pass for outputs nobody keeps).
    Returns (composited (G, F, T), (d_loss_last (G,), g_loss_last (G,)))
    — the single-clip methods.neural.gan_train_restore contract, batched.
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    if mesh is None:
        mesh = make_mesh(1)
    norm = jnp.asarray(norm_batch, jnp.float32)
    real = jnp.asarray(real_batch, jnp.float32)
    msk = jnp.asarray(mask_batch, jnp.float32)
    g, f, t = norm.shape
    assert g % mesh.devices.size == 0, (g, mesh.devices.size)
    inp = _pad_batched(norm, -1.0)       # -1 = silence in the GAN's space
    realp = _pad_batched(real, -1.0)
    mskp = _pad_batched(msk, 1.0)        # pad = kept
    vld = _valid_batched(g, f, t)
    if valid_batch is not None:
        vld = vld * _pad_batched(jnp.asarray(valid_batch, jnp.float32), 0.0)
    keys = jax.random.split(key, g)

    def run(inp_, realp_, mskp_, vld_, keys_):
        state = _init_fn(mesh, cfg)(keys_, inp_)
        dl = gl = None
        done = 0
        while done < cfg.epochs:
            n = min(cfg.scan_chunk, cfg.epochs - done)
            state, dl, gl = _chunk_fn(mesh, cfg, n)(state, inp_, realp_,
                                                    mskp_, vld_)
            done += n
        return _comp_fn(mesh, cfg)(state, inp_, mskp_, vld_), dl, gl

    out, dl, gl = run(inp, realp, mskp, vld, keys)
    if cfg.retry_l1 > 0.0:
        # per-clip mode-collapse retry, same signature and folded-key policy
        # as the single-clip path (methods.neural.gan_train_restore); the
        # failed subset retrains in ONE second batched pass, padded by
        # repeating its first clip up to a power-of-two multiple of the
        # mesh size (capped at G) so the set of retry shapes — and hence
        # of XLA programs the 100-epoch scan chunk compiles — stays
        # logarithmic in G instead of one per distinct failure count
        import numpy as np

        hole = (1.0 - mskp) * vld
        # np.array (copy): asarray of a jax array is a READ-ONLY view and
        # the n_real masking below writes into it
        l1 = np.array(jnp.sum(jnp.abs(out - realp) * hole, axis=(1, 2))
                      / jnp.maximum(jnp.sum(hole, axis=(1, 2)), 1e-9))
        if n_real is not None:
            l1[n_real:] = 0.0         # padding duplicates never gate a retry
        bad = np.flatnonzero(l1 > cfg.retry_l1)
        if bad.size:
            quota = mesh.devices.size
            while quota < bad.size:
                quota *= 2
            quota = min(quota, g)
            sel = np.concatenate(
                [bad, np.repeat(bad[:1], quota - bad.size)])
            keys2 = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys[sel])
            out2, dl2, gl2 = run(inp[sel], realp[sel], mskp[sel], vld[sel],
                                 keys2)
            out = out.at[bad].set(out2[:bad.size])
            dl = dl.at[bad].set(dl2[:bad.size])
            gl = gl.at[bad].set(gl2[:bad.size])
    return out[:, :f, :t], (dl, gl)

"""Multi-clip data-parallel training of a shared inpainting U-Net.

Beyond-parity capability: instead of the reference's one-net-per-clip
overfit (SURVEY.md §2 "known defects"), train ONE SimpleUNet on a batch of
corrupted spectrograms sharded across the mesh's ``dp`` axis. Parameters are
replicated; XLA inserts the gradient all-reduce over ICI from the sharding
annotations alone — no hand-written collectives.

This is also the multi-chip path the driver dry-runs (``__graft_entry__.
dryrun_multichip``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.unet import SimpleUNet
from .mesh import shard_batch

_TX = optax.adam(1e-3)


def init_shared_unet(key: jax.Array, f: int, t: int):
    model = SimpleUNet()
    params = model.init(key, jnp.zeros((1, f, t, 1)))["params"]
    return params, _TX.init(params)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def shared_unet_train_step(params, opt_state, batch, target, mask):
    """One masked-MSE step on a (B, F, T, 1) batch.

    With ``batch/target/mask`` sharded over dp and params replicated, the
    per-shard gradient contributions are combined by an XLA all-reduce.
    """
    model = SimpleUNet()

    def loss_fn(p):
        out = model.apply({"params": p}, batch)
        inv = 1.0 - mask
        return jnp.mean((out * inv - target * inv) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = _TX.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


def fit_shared_unet(batch, target, mask, mesh: Mesh, steps: int = 100,
                    key: jax.Array | int = 0):
    """Train the shared U-Net for ``steps`` over a dp-sharded clip batch."""
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    batch = shard_batch(jnp.asarray(batch, jnp.float32), mesh)
    target = shard_batch(jnp.asarray(target, jnp.float32), mesh)
    mask = shard_batch(jnp.asarray(mask, jnp.float32), mesh)
    params, opt_state = init_shared_unet(key, batch.shape[1], batch.shape[2])
    params = jax.device_put(params, NamedSharding(mesh, P()))
    opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
    loss = None
    for _ in range(steps):
        params, opt_state, loss = shared_unet_train_step(
            params, opt_state, batch, target, mask)
    return params, float(loss)

"""Device-mesh / sharding helpers.

The reference is strictly single-process single-device (SURVEY.md §2: no
distributed code at all), so capability parity needs no collectives. This
layer exists so that scaling *beyond* the reference — restoring a corpus of
clips, or training one shared inpainting model across many clips — is a
config change, not a rewrite (SURVEY.md §5.8):

- ``dp`` axis: clips are data-parallel across chips; gradients of the shared
  model ride ICI via XLA-inserted all-reduce.
- Single-chip runs use a trivial 1-device mesh, so all method code is
  mesh-ready by construction.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(x: jax.Array, mesh: Mesh, axis: str = "dp") -> jax.Array:
    """Place a batch-leading array with its leading dim sharded over ``axis``."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicated(x, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))

"""Flat-vector Adam: the whole parameter tree as ONE fused update.

Why: optax's tree-mapped Adam emits ~4 small HLOs per parameter leaf per
step. The per-clip GAN has 58 leaves across G+D, so every epoch carries a
few hundred micro-ops whose ~1-2 us/op dispatch floor is pure overhead at
this model size (160k params = 0.64 MB — the update math itself is
nanoseconds). Device traces of the GAN epoch (docs/mfu_v5e.json round)
show ~1.3 ms/epoch of copy-done + 0.5 ms of dynamic-update-slice against
a 12.7 ms total. Concatenating every leaf into one f32 vector turns the
optimizer into three large fused elementwise ops regardless of leaf count.

The math matches ``optax.adam`` exactly (scale_by_adam with eps_root=0:
update = mu_hat / (sqrt(nu_hat) + eps), bias correction by step count) and
is elementwise, so flat results are bitwise-identical to the per-leaf form.

Layout contract: ``to_flat`` concatenates ``tree_leaves`` ravels in tree
order; ``from_flat`` inverts it with static slices (free at trace time,
fusable). Conversion to/from optax's ``ScaleByAdamState`` happens once per
scan chunk (not per epoch), so checkpoints, tools, and the public API keep
the optax state format.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class FlatSpec(NamedTuple):
    treedef: jax.tree_util.PyTreeDef
    shapes: tuple[tuple[int, ...], ...]
    sizes: tuple[int, ...]

    @property
    def total(self) -> int:
        return sum(self.sizes)


class FlatAdamState(NamedTuple):
    count: jax.Array   # int32 scalar, optax-compatible step count
    mu: jax.Array      # (total,) f32
    nu: jax.Array      # (total,) f32


def make_spec(tree) -> FlatSpec:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return FlatSpec(treedef,
                    tuple(tuple(l.shape) for l in leaves),
                    tuple(int(l.size) for l in leaves))


def to_flat(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in leaves])


def from_flat(vec: jax.Array, spec: FlatSpec):
    out, off = [], 0
    for sh, sz in zip(spec.shapes, spec.sizes):
        out.append(jax.lax.slice(vec, (off,), (off + sz,)).reshape(sh))
        off += sz
    return jax.tree_util.tree_unflatten(spec.treedef, out)


def adam_init(n: int) -> FlatAdamState:
    return FlatAdamState(jnp.zeros((), jnp.int32),
                         jnp.zeros((n,), jnp.float32),
                         jnp.zeros((n,), jnp.float32))


def adam_step(params: jax.Array, grads: jax.Array, state: FlatAdamState,
              lr: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8) -> tuple[jax.Array, FlatAdamState]:
    """One Adam step on the flat vector; optax.adam-identical math."""
    count = state.count + 1
    mu = b1 * state.mu + (1.0 - b1) * grads
    nu = b2 * state.nu + (1.0 - b2) * jnp.square(grads)
    c = count.astype(jnp.float32)
    mu_hat = mu / (1.0 - jnp.power(b1, c))
    nu_hat = nu / (1.0 - jnp.power(b2, c))
    new_params = params - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    return new_params, FlatAdamState(count, mu, nu)


def optax_to_flat(opt_state, spec: FlatSpec) -> FlatAdamState:
    """optax.adam state -> flat (once per chunk). Accepts the (ScaleByAdam,
    EmptyState) tuple optax.adam produces."""
    sba = opt_state[0]
    return FlatAdamState(jnp.asarray(sba.count, jnp.int32),
                         to_flat(sba.mu), to_flat(sba.nu))


def flat_to_optax(state: FlatAdamState, spec: FlatSpec, like_opt_state):
    """Flat state -> the optax.adam state structure of ``like_opt_state``."""
    sba = like_opt_state[0]
    new_sba = optax.ScaleByAdamState(count=state.count,
                                     mu=from_flat(state.mu, spec),
                                     nu=from_flat(state.nu, spec))
    return (new_sba,) + tuple(like_opt_state[1:])

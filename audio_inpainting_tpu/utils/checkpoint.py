"""Checkpoint/resume for trained method models.

The reference has no checkpointing at all — U-Net/GAN weights are retrained
from scratch per run and discarded (SURVEY.md §5: no torch.save anywhere).
This module adds orbax-backed param persistence so per-clip training can be
resumed or reused, and so shared models trained with parallel/train.py can
be served later.
"""

from __future__ import annotations

import os
import re


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_params(params, path: str) -> str:
    """Save a param pytree to ``path`` (an orbax directory)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, params, force=True)
    return path


def load_params(path: str):
    """Load a param pytree saved by save_params.

    Restores every leaf as a host numpy array, NOT as a jax.Array with the
    sharding recorded at save time: a checkpoint written on the TPU embeds
    its device in the sharding file, and restoring that on a CPU-only
    process (tests, a serving box) fails with "Device TPU v5 lite0 was not
    found". The committed corpus prior must load anywhere; jit staging
    re-places the arrays on whatever devices the caller has.
    """
    import jax
    import numpy as np
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    path = os.path.abspath(path)
    meta = ckptr.metadata(path).item_metadata
    restore_args = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta.tree)
    return ckptr.restore(path, restore_args=restore_args)


def latest_checkpoint(directory: str, prefix: str = "step_") -> str | None:
    """Return the highest-numbered ``<prefix>N`` checkpoint dir, if any."""
    if not os.path.isdir(directory):
        return None
    best, best_n = None, -1
    for name in os.listdir(directory):
        m = re.fullmatch(re.escape(prefix) + r"(\d+)", name)
        if m and int(m.group(1)) > best_n:
            best, best_n = os.path.join(directory, name), int(m.group(1))
    return best

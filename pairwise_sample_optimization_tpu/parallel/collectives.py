"""Collective helpers mirroring the reference's Accelerate usage.

Reference operations and their TPU-native equivalents:

- DDP gradient allreduce (``accelerator.backward``, reference
  ``train_online_pso_sdxl_turbo.py:857``)  -> ``jax.lax.pmean`` inside the
  pjit'd train step (``pmean_tree``), riding ICI.
- ``accelerator.gather(rewards)`` (``:679``)  -> ``all_gather_batch``.
- padded eval gather (``evaluate_sdxl_dmd2.py:99-123``)  -> ``padded_gather``:
  pad the last shard, all-gather, truncate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import DATA_AXIS


def pmean_tree(tree, axis_name: str = DATA_AXIS):
    """Mean-allreduce every leaf over the named mesh axis."""
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), tree)


def psum_tree(tree, axis_name: str = DATA_AXIS):
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), tree)


def all_gather_batch(x, axis_name: str = DATA_AXIS):
    """Gather shards along the batch axis (axis 0), concatenated."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def padded_gather(host_arrays: list[np.ndarray], total: int) -> np.ndarray:
    """Host-level gather with pad/truncate semantics for uneven shards.

    Mirrors the reference's pad-last-rank ``accelerator.gather`` then
    truncate-to-dataset-size reduction (``evaluate_sdxl_dmd2.py:99-123``),
    for use outside jit (e.g. eval score aggregation across processes).
    """
    out = np.concatenate([np.asarray(a) for a in host_arrays], axis=0)
    return out[:total]


def tree_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))

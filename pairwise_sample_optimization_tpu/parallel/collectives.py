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


def process_allgather(x: np.ndarray) -> np.ndarray:
    """Host-level all-gather of this process's array: (n, ...) -> stacked
    (process_count, n, ...) in process order. The TPU-native equivalent of
    ``accelerator.gather`` outside jit (reference ``evaluate_sdxl_dmd2.py:99``).

    Single-process: returns x[None] without touching the runtime, so code
    is shape-identical either way.
    """
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=False))


def padded_gather(host_arrays: list[np.ndarray], total: int) -> np.ndarray:
    """Cross-process gather with pad/truncate semantics for uneven shards.

    Mirrors the reference's pad-last-rank ``accelerator.gather`` then
    truncate-to-dataset-size reduction (``evaluate_sdxl_dmd2.py:99-123``)
    for *block*-sharded data: every process passes its equal-size padded
    shard(s); the result is [proc0 | proc1 | ...][:total].
    """
    local = np.concatenate([np.asarray(a) for a in host_arrays], axis=0)
    stacked = process_allgather(local)
    out = stacked.reshape((-1,) + stacked.shape[2:])
    return out[:total]


def round_robin_gather(local: np.ndarray, total: int) -> np.ndarray:
    """Cross-process gather restoring dataset order for round-robin shards.

    For shards built as ``items[rank::n_proc]`` padded to equal length,
    item ``pos`` of rank ``r`` is dataset index ``pos * n_proc + r`` —
    interleave accordingly, then truncate (pads land past ``total`` by
    construction). This is what the reference's per-step interleaved
    ``accelerator.gather`` achieves implicitly (``evaluate_sdxl_dmd2.py:99-123``).
    """
    stacked = process_allgather(np.asarray(local))  # (n_proc, per, ...)
    out = np.moveaxis(stacked, 0, 1).reshape((-1,) + stacked.shape[2:])
    return out[:total]


def process_mean(x: np.ndarray) -> np.ndarray:
    """Mean of equal-size per-process arrays across all processes
    (reference reward-mean logging, ``train_online_pso_sdxl_turbo.py:679``)."""
    return process_allgather(np.asarray(x)).mean()


def tree_global_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves))

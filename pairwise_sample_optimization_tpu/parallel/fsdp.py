"""FSDP/ZeRO-3-style parameter sharding over the ``data`` axis.

The reference replicates the 2.6B-param UNet on every GPU (DDP). On a
16 GB v5e chip the replicated bf16 weight suite (~7 GB with both CLIP
towers and the VAE) is what forces full rematerialization in the update
phase (BENCHMARKS.md: every selective-remat policy OOMs). Sharding the
frozen weights over the ``data`` axis cuts per-chip weight HBM by the
mesh size — on a v5e-8 that frees ~4.5 GB for activations. This is a
capability beyond reference parity, expressed the TPU way: annotate
parameter shardings and let GSPMD insert the per-layer all-gathers over
ICI (the scaling-book FSDP recipe); no model code changes.

Each parameter above ``min_size`` elements is sharded along its largest
axis divisible by the mesh axis size; small/indivisible leaves stay
replicated (their memory is negligible).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def _fsdp_spec(shape, n: int, min_size: int) -> P:
    size = 1
    for s in shape:
        size *= s
    if size < min_size or not shape:
        return P()
    for d in sorted(range(len(shape)), key=lambda i: shape[i], reverse=True):
        if shape[d] % n == 0:
            return P(*[DATA_AXIS if i == d else None for i in range(len(shape))])
    return P()


def fsdp_param_shardings(tree, mesh: Mesh, min_size: int = 2**16):
    """NamedSharding pytree: FSDP-shard every large leaf over ``data``."""
    n = mesh.shape[DATA_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _fsdp_spec(leaf.shape, n, min_size)),
        tree,
    )


def shard_params_fsdp(tree, mesh: Mesh, min_size: int = 2**16):
    """Place a param pytree with FSDP shardings (use for the frozen
    ``variables['params']``; keep the small trainable LoRA tree and the
    optimizer state replicated — they are the DDP-equivalent part)."""
    return jax.tree.map(
        jax.device_put, tree, fsdp_param_shardings(tree, mesh, min_size)
    )

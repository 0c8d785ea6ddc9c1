"""Device mesh construction and sharding helpers.

The reference implementation's entire distributed story is HF Accelerate
data-parallelism over NCCL (one process per GPU; see reference
``train_online_pso_sdxl_turbo.py:228-233,491-493``). On TPU the mesh *is*
the backend: we build a ``jax.sharding.Mesh`` with a ``data`` axis (and an
optional ``model`` axis kept general for tensor-parallel UNet sharding,
which the reference never had), annotate shardings, and let XLA insert the
ICI collectives.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data * model`` must equal the device count.

    ``model=1`` (the default) replicates the model on every chip and shards
    the batch — the TPU equivalent of the reference's DDP-only strategy.
    """

    data: int = -1  # -1: use all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data != -1 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"Mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def make_mesh(
    spec: MeshSpec = MeshSpec(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Place a host-local batch pytree with the batch axis sharded over data."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), tree
    )


def replicate(mesh: Mesh, tree):
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


@functools.lru_cache(maxsize=128)
def _identity_jit(sharding: NamedSharding):
    """Cached jitted identity for cross-host resharding: a fresh
    ``jax.jit(lambda a: a)`` per call would defeat the jit cache and
    retrace on every hot-loop reshard (slow remote compiler here)."""
    return jax.jit(lambda a: a, out_shardings=sharding)


def shard_global_batch(mesh: Mesh, tree, axis: int = 0):
    """Place a per-host batch pytree with batch ``axis`` sharded over ``data``.

    The multi-host form of ``shard_batch``: each process contributes its
    host-local rows and the result is one global array whose batch
    dimension is the concatenation over processes (the TPU-native
    equivalent of the reference's per-rank DataLoader shards under DDP,
    ``train_online_pso_sdxl_turbo.py:491-493``). Single-process it is a
    plain ``device_put``. Leaves whose global batch dim does not divide
    the ``data`` axis size are replicated instead (correct, just not
    parallel — tiny smoke configs hit this); multi-host, replication of
    host-DIFFERENT inputs first all-gathers them so every host holds the
    same true global value.
    """
    n = mesh.shape[DATA_AXIS]
    multi = jax.process_count() > 1

    def place(x):
        is_global = (
            multi and isinstance(x, jax.Array) and not x.is_fully_addressable
        )
        # global batch size: host-local inputs concatenate over processes
        b = 0 if np.ndim(x) <= axis else np.shape(x)[axis] * (
            1 if (is_global or not multi) else jax.process_count()
        )
        spec = P() if (not b or b % n) else P(*([None] * axis), DATA_AXIS)
        sharding = NamedSharding(mesh, spec)
        if is_global:
            # e.g. a train_epoch slice of globally assembled samples:
            # reshard via a jitted identity (device_put can't cross hosts)
            return _identity_jit(sharding)(x)
        if multi:
            from jax.experimental import multihost_utils

            if spec == P() and b:
                # replicated fallback for a HOST-LOCAL batched leaf:
                # host_local_array_to_global_array with P() would treat
                # each host's (different!) rows as the full global value
                # — silently dropping the other hosts' rows. Build the
                # true global batch on every host first.
                gathered = multihost_utils.process_allgather(np.asarray(x))
                x = np.concatenate(list(gathered), axis=axis)
            return multihost_utils.host_local_array_to_global_array(
                np.asarray(x), mesh, spec
            )
        return jax.device_put(x, sharding)

    return jax.tree.map(place, tree)


def move_to_memory_kind(tree, kind: str):
    """Move every array of ``tree`` to the given memory kind ("device" or
    "pinned_host"), preserving its sharding. Used to park phase-exclusive
    weight suites (VAE/scorer/TE during the update phase) in TPU-host
    memory: on a 16 GB v5e the ~4-5.5 GB they occupy is the difference
    between remat-full and the dots-policy update program (BENCHMARKS.md
    "selective remat vs the 16 GB envelope"). The transfers ride the
    device<->host PCIe link, not any external network."""

    def put(x):
        if not hasattr(x, "sharding"):
            return x
        if getattr(x.sharding, "memory_kind", None) == kind:
            return x
        return jax.device_put(x, x.sharding.with_memory_kind(kind))

    return jax.tree.map(put, tree)


def fetch_replicated(mesh: Mesh, x) -> np.ndarray:
    """Fetch a (possibly data-sharded, possibly multi-host-global) array as
    a full numpy copy on every host. Replicates via a jitted identity (a
    mesh all-gather over ICI) so multi-host shards become addressable."""
    if jax.process_count() == 1:
        return np.asarray(x)
    rep = _identity_jit(replicated_sharding(mesh))(x)
    return np.asarray(rep)

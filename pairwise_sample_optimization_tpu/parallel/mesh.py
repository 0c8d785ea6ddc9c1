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

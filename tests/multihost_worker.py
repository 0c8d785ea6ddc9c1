"""Worker for the 2-process jax.distributed loopback test.

Launched by tests/test_multihost.py with PSO_COORDINATOR/PSO_NUM_PROCESSES/
PSO_PROCESS_ID set. Exercises the real cross-process paths on the CPU
platform: distributed bring-up, psum across processes, process_allgather,
and the round-robin eval gather's order restoration.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge

xla_bridge._clear_backends()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pairwise_sample_optimization_tpu.parallel.multihost import (
    maybe_initialize_distributed,
)

assert maybe_initialize_distributed(), "distributed bring-up failed"
assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()

from pairwise_sample_optimization_tpu.parallel.collectives import (
    padded_gather,
    process_allgather,
    round_robin_gather,
)

# --- process_allgather: stacked in process order ---
g = process_allgather(np.arange(3.0) + 10 * rank)
np.testing.assert_array_equal(g, np.stack([np.arange(3.0), np.arange(3.0) + 10]))

# --- padded_gather: block order + truncate ---
out = padded_gather([np.full((3,), float(rank))], total=5)
np.testing.assert_array_equal(out, np.array([0.0, 0, 0, 1, 1]))

# --- round_robin_gather: items[rank::2] shards come back in dataset order ---
items = np.arange(7.0) * 2.0
shard = items[rank::2]
per = 4
shard = np.concatenate([shard, np.repeat(shard[-1:], per - len(shard))])
np.testing.assert_array_equal(round_robin_gather(shard, 7), items)

# --- cross-process reduce through a jitted mesh program ---
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

devs = np.array(jax.devices())  # 1 per process -> 2 global
assert devs.size == 2, devs
mesh = Mesh(devs, ("data",))
x = multihost_utils.host_local_array_to_global_array(
    np.full((1,), float(rank + 1)), mesh, P("data")
)
s = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
val = float(np.asarray(s.addressable_data(0)))  # replicated: read local shard
assert val == 3.0, val  # 1 + 2 reduced across both processes

print(f"WORKER_OK rank={rank}")

"""Probe: does device_put to pinned_host memory work through axon?

The host-offload path (``move_to_memory_kind``) depends on the backend
supporting the pinned_host memory space. Exit 0 iff a device array
round-trips device -> pinned_host -> device with intact values.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

x = jnp.arange(1024.0).reshape(32, 32)
x = x * 2.0  # make it a real device array
try:
    h = jax.device_put(x, x.sharding.with_memory_kind("pinned_host"))
    jax.block_until_ready(h)
    d = jax.device_put(h, h.sharding.with_memory_kind("device"))
    val = np.asarray(d + 0.0)  # readback through compute = the real sync
except Exception as e:  # noqa: BLE001
    print(f"pinned_host UNSUPPORTED here: {type(e).__name__}: {e}", file=sys.stderr)
    sys.exit(1)
assert val[1, 1] == 66.0, val[1, 1]
print("pinned_host ok")

"""Measure device <-> pinned_host transfer bandwidth for the offload path.

The full-loop bench measured `offload_aux_during_update` costing ~20 s
per epoch at 512^2 (~5 GB of aux weights each way). This probe times a
1 GiB roundtrip in isolation so BENCHMARKS.md can attribute the cost:
if bandwidth is O(100 MB/s) the path is being staged through the axon
tunnel (an environment artifact); if it is O(10 GB/s) the cost model
for a real pod host holds and only the per-epoch amortization argument
remains.

Usage: python -u scripts/probe_offload_bandwidth.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

GB = 1024**3
NBYTES = 1 * GB


def sync(x):
    # axon: only value readback reliably syncs (CLAUDE.md timing gotcha)
    np.asarray(jax.jit(lambda a: a.reshape(-1)[:1])(x))


def main():
    n = NBYTES // 2  # bf16 elements
    x = jnp.zeros((n,), jnp.bfloat16) + 1.0
    sync(x)
    dev = x.sharding
    host = dev.with_memory_kind("pinned_host")

    for label, src, dst in (("device->pinned_host", x, host),
                            ("warm repeat ->host", x, host)):
        t0 = time.perf_counter()
        h = jax.device_put(src, dst)
        jax.block_until_ready(h)
        t1 = time.perf_counter()
        print(f"{label}: {t1 - t0:.3f}s  ({NBYTES / (t1 - t0) / 1e9:.2f} GB/s)")

    h = jax.device_put(x, host)
    jax.block_until_ready(h)
    t0 = time.perf_counter()
    d = jax.device_put(h, dev.with_memory_kind("device"))
    jax.block_until_ready(d)
    t1 = time.perf_counter()
    sync(d)
    t2 = time.perf_counter()
    print(f"pinned_host->device: dispatch {t1 - t0:.3f}s, synced {t2 - t0:.3f}s "
          f"({NBYTES / (t2 - t0) / 1e9:.2f} GB/s)")


if __name__ == "__main__":
    main()

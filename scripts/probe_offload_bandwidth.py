"""Measure device <-> pinned_host transfer bandwidth for the offload path.

The full-loop bench measured `offload_aux_during_update` costing ~8-20 s
per epoch (~4.4 GB of aux weights each way). This probe times a 1 GiB
transfer each way so BENCHMARKS.md can attribute the cost.

Sync discipline (CLAUDE.md timing gotchas): `jax.block_until_ready` can
return before execution completes through the axon tunnel; only value
readback reliably syncs — and there is no cheap readback of a
pinned_host array (any op on it round-trips through the device). So:

- restore (pinned_host -> device) is timed directly, synced by a
  1-element device readback;
- park (device -> pinned_host) is derived by SUBTRACTION: the synced
  full roundtrip (park + restore, readback at the end) minus the synced
  restore. The naive block_until_ready park timing is printed too,
  labeled as a dispatch-bound lower bound, not a measurement.

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
    device = dev.with_memory_kind("device")

    # restore leg, directly synced (warm: repeat 3x, take min)
    h = jax.device_put(x, host)
    jax.block_until_ready(h)
    restore = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(h, device)
        sync(d)
        restore.append(time.perf_counter() - t0)
    t_restore = min(restore)
    print(f"pinned_host->device (restore, readback-synced): "
          f"{t_restore:.3f}s  ({NBYTES / t_restore / 1e9:.2f} GB/s)")

    # full roundtrip, synced at the end -> park = roundtrip - restore
    rt = []
    for _ in range(3):
        t0 = time.perf_counter()
        h2 = jax.device_put(x, host)
        d2 = jax.device_put(h2, device)
        sync(d2)
        rt.append(time.perf_counter() - t0)
    t_rt = min(rt)
    t_park = max(t_rt - t_restore, 1e-9)
    print(f"roundtrip (park+restore, readback-synced): {t_rt:.3f}s")
    print(f"device->pinned_host (park, BY SUBTRACTION): "
          f"{t_park:.3f}s  ({NBYTES / t_park / 1e9:.2f} GB/s)")

    # the naive timing, for comparison only (block_until_ready may
    # return early through the tunnel — treat as a lower bound)
    t0 = time.perf_counter()
    h3 = jax.device_put(x, host)
    jax.block_until_ready(h3)
    t_naive = time.perf_counter() - t0
    print(f"park naive block_until_ready (LOWER BOUND only): "
          f"{t_naive:.3f}s  ({NBYTES / t_naive / 1e9:.2f} GB/s)")


if __name__ == "__main__":
    main()

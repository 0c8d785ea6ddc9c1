"""Probe: exit 0 iff the axon TPU backend initializes and executes.

Used by the A/B queue scripts to wait out tunnel outages (the remote
backend drops intermittently; runs launched during an outage burn ~25
minutes in backend init before failing Unavailable).
"""

import sys

try:
    import jax
    import numpy as np

    x = jax.numpy.arange(8.0)
    val = float(np.asarray(x * 2.0).sum())  # readback = the only real sync
    assert val == 56.0, val
except Exception as e:  # noqa: BLE001 - any failure means "not healthy"
    print(f"unhealthy: {type(e).__name__}: {e}", file=sys.stderr)
    sys.exit(1)
print("healthy")

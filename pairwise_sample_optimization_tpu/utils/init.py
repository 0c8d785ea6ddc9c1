"""Fast zero-fill initialization for throughput benches / compile checks.

``fast_init`` paths replace real random init (minutes for the 2.6B UNet
on the 1-core host) with zeros from ``eval_shape``. Filling per leaf via
eager ``jnp.zeros`` costs one device dispatch per leaf — ~2000 dispatches
for the SDXL tree, each paying the axon tunnel's session RTT (~25 ms):
measured ~200 s of bench startup. One jitted program allocates the whole
tree in a single dispatch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zeros_from_shapes(shapes):
    """Materialize a pytree of zeros matching an ``eval_shape`` tree in
    ONE device program (single dispatch, persistent-cache friendly)."""
    return jax.jit(
        lambda: jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    )()

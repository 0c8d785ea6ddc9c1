"""PRNG discipline for multi-host / multi-trajectory sampling.

The reference relies on ``set_seed(seed, device_specific=True)`` so each DDP
rank draws different prompts and noise (reference
``train_online_pso_sdxl_turbo.py:238``). The JAX-native equivalent is
explicit key folding: one root key, folded per (host, epoch, trajectory,
step). Everything is deterministic given the root seed and the fold path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def host_fold(key: jax.Array, process_index: int | None = None) -> jax.Array:
    """Fold in the host index so each process draws distinct randomness."""
    if process_index is None:
        process_index = jax.process_index()
    return jax.random.fold_in(key, process_index)


def per_device_keys(key: jax.Array, n: int) -> jax.Array:
    """n distinct keys, e.g. one per local device or per batch element."""
    return jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))


def split_for_steps(key: jax.Array, num_steps: int) -> jax.Array:
    """(num_steps, 2) key array for a lax.scan over denoising steps."""
    return jax.random.split(key, num_steps)


def epoch_key(root: jax.Array, epoch: int, tag: int = 0) -> jax.Array:
    """Key for one epoch phase; ``tag`` separates sample/shuffle/etc."""
    return jax.random.fold_in(jax.random.fold_in(root, epoch), tag)

"""Shared Gaussian transition-density helper for the step/logprob kernels.

One implementation of the density the PSO loss consumes (beta=50 makes
the loss sensitive to its exact numerics — reference
``turbo_inference_with_logprob.py:108-114``): fp32, ``stop_gradient`` on
the realized transition, and MEAN (not sum) over all non-batch dims.
Used by ``euler_ancestral``, ``ddpm_renoise`` and ``ddim`` so a numerics
fix cannot silently miss one copy.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)


def bcast(v: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape (B,) -> (B, 1, ..., 1) for broadcasting over sample dims."""
    return v.reshape(v.shape + (1,) * (ndim - 1))


def gaussian_logprob_mean(x, mean, std_b):
    """Mean-over-non-batch-dims Gaussian log density; ``std_b`` is
    broadcast-shaped. The realized transition ``x`` is stop-gradiented
    (the density's gradient flows through ``mean``/``std`` only)."""
    ll = (
        -jnp.square(jax.lax.stop_gradient(x) - mean) / (2.0 * jnp.square(std_b))
        - jnp.log(std_b)
        - LOG_SQRT_2PI
    )
    return jnp.mean(ll.reshape(ll.shape[0], -1), axis=-1)

"""DDPM re-noise transition kernel for distilled (DMD2-style) samplers.

TPU-native rebuild of the reference
``pso_pytorch/diffusers_patch/distilled_inference_with_logprob.py:45-137``:
the distilled model jumps to x0 and the transition to the next lattice
timestep is the DDPM *forward* process around sqrt(abar_prev) * x0 with
std sqrt(1 - abar_prev).

Quirk replicated behind a flag: the reference draws the transition noise
with shape ``(1, C, H, W)`` — shared across the batch (``:121-126``).
``shared_noise=True`` reproduces that; ``False`` is the fixed variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gaussian import bcast as _bcast, gaussian_logprob_mean as _gaussian_logprob_mean


def x0_from_eps(
    sample: jnp.ndarray,
    eps: jnp.ndarray,
    alphas_cumprod: jnp.ndarray,
    timestep: jnp.ndarray,
) -> jnp.ndarray:
    """x0 = (x_t - sqrt(1-abar_t) eps) / sqrt(abar_t) (ref ``:36-42``)."""
    a = _bcast(jnp.take(alphas_cumprod, timestep), sample.ndim)
    return (sample - jnp.sqrt(1.0 - a) * eps) / jnp.sqrt(a)


def _prev_mean_std(alphas_cumprod, eps, timestep, prev_timestep, x_t):
    x_t = x_t.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    pred_x0 = x0_from_eps(x_t, eps, alphas_cumprod, timestep)
    a_prev = jnp.take(alphas_cumprod, prev_timestep)
    mean = _bcast(jnp.sqrt(a_prev), x_t.ndim) * pred_x0
    std = jnp.sqrt(1.0 - a_prev)  # (B,)
    return mean, std


def distilled_step_with_logprob(
    alphas_cumprod: jnp.ndarray,
    eps: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    x_t: jnp.ndarray,
    key: jax.Array,
    shared_noise: bool = True,
    noise: jnp.ndarray | None = None,
):
    """Re-noise to ``prev_timestep``: x_prev ~ N(sqrt(abar_prev) x0, 1-abar_prev).

    Args:
      alphas_cumprod: (T,) table from ``make_alphas_cumprod``.
      timestep / prev_timestep: (B,) int32 lattice timesteps.
      shared_noise: draw one noise sample broadcast over the batch
        (reference parity) instead of i.i.d. per-sample noise.
      noise: explicit (B, h, w, C) standard-normal transition noise —
        overrides the draw (per-sample-keyed eval; shared_noise ignored).
    """
    mean, std = _prev_mean_std(alphas_cumprod, eps, timestep, prev_timestep, x_t)
    if noise is None:
        noise_shape = (1,) + mean.shape[1:] if shared_noise else mean.shape
        noise = jax.random.normal(key, noise_shape, dtype=jnp.float32)
    std_b = _bcast(std, mean.ndim)
    x_prev = mean + std_b * noise
    logprob = _gaussian_logprob_mean(x_prev, mean, std_b)
    return x_prev, logprob


def distilled_logprob(
    alphas_cumprod: jnp.ndarray,
    eps: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    x_t: jnp.ndarray,
    x_prev: jnp.ndarray,
):
    """Density of a stored transition (train recompute path, ref
    ``train_online_pso_sdxl_dmd2.py:812-840``, with
    ``prev_timestep = t - step_ratio``)."""
    mean, std = _prev_mean_std(alphas_cumprod, eps, timestep, prev_timestep, x_t)
    return _gaussian_logprob_mean(
        x_prev.astype(jnp.float32), mean, _bcast(std, mean.ndim)
    )

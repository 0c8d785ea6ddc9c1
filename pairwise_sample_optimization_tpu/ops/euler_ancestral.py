"""Euler-ancestral (VE-SDE) transition kernel with Gaussian log-density.

TPU-native rebuild of the SDXL-Turbo stochastic step (reference
``pso_pytorch/diffusers_patch/turbo_inference_with_logprob.py:24-116``):
fully batched over step indices (no Python timestep lookup), pure
functions usable inside ``lax.scan`` on the sampling path and inside the
differentiated train step on the recompute path.

Semantics replicated exactly (the beta=50 DPO loss is sensitive to these):
- computation in float32 regardless of input dtype (ref ``:69``);
- x0 = x - sigma * eps (VE parameterization, ref ``:73``);
- mean = x + (x - x0)/sigma * (sigma_down - sigma) (ref ``:88-92``);
- log-density is the *mean* (not sum) over non-batch dims (ref ``:114``);
- the realized transition is treated as a constant in the density
  (``stop_gradient`` = ref's ``prev_sample.detach()``, ``:109``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gaussian import bcast as _bcast, gaussian_logprob_mean as _gaussian_logprob_mean
from .schedules import EulerAncestralSchedule


def turbo_step_stats(schedule: EulerAncestralSchedule, step_index: jnp.ndarray):
    """Per-sample (sigma, sigma_up, sigma_down) for a batch of step indices."""
    sigma = jnp.take(schedule.sigmas, step_index)
    sigma_up = jnp.take(schedule.sigma_up, step_index)
    sigma_down = jnp.take(schedule.sigma_down, step_index)
    return sigma, sigma_up, sigma_down


def _prev_mean(schedule, eps, step_index, x_t):
    x_t = x_t.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    sigma, sigma_up, sigma_down = turbo_step_stats(schedule, step_index)
    sigma_b = _bcast(sigma, x_t.ndim)
    # x0 = x - sigma*eps; derivative = (x - x0)/sigma = eps; dt = sigma_down - sigma
    # mean = x + eps * (sigma_down - sigma). Written in the expanded form of the
    # reference to match its float32 rounding exactly.
    pred_x0 = x_t - sigma_b * eps
    derivative = (x_t - pred_x0) / sigma_b
    mean = x_t + derivative * _bcast(sigma_down - sigma, x_t.ndim)
    return mean, sigma_up


def turbo_step_with_logprob(
    schedule: EulerAncestralSchedule,
    eps: jnp.ndarray,
    step_index: jnp.ndarray,
    x_t: jnp.ndarray,
    key: jax.Array,
):
    """Sample x_{t-1} ~ N(mean, sigma_up^2) and return its log density.

    Args:
      eps: UNet epsilon prediction, (B, ...).
      step_index: (B,) int32 indices into the schedule tables.
      x_t: current (unscaled) latents, (B, ...).
      key: PRNG key for the transition noise.
    Returns: (x_prev float32, logprob (B,) float32).
    """
    mean, sigma_up = _prev_mean(schedule, eps, step_index, x_t)
    noise = jax.random.normal(key, mean.shape, dtype=jnp.float32)
    sigma_up_b = _bcast(sigma_up, mean.ndim)
    x_prev = mean + noise * sigma_up_b
    logprob = _gaussian_logprob_mean(x_prev, mean, sigma_up_b)
    return x_prev, logprob


def turbo_logprob(
    schedule: EulerAncestralSchedule,
    eps: jnp.ndarray,
    step_index: jnp.ndarray,
    x_t: jnp.ndarray,
    x_prev: jnp.ndarray,
):
    """Log density of a stored transition under the current model (recompute
    path of the online trainer, ref ``train_online_pso_sdxl_turbo.py:810-837``)."""
    mean, sigma_up = _prev_mean(schedule, eps, step_index, x_t)
    sigma_up_b = _bcast(sigma_up, mean.ndim)
    return _gaussian_logprob_mean(x_prev.astype(jnp.float32), mean, sigma_up_b)


def scale_model_input(
    schedule: EulerAncestralSchedule, x_t: jnp.ndarray, step_index: jnp.ndarray
) -> jnp.ndarray:
    """Euler input scaling x / sqrt(sigma^2 + 1) (ref sampler ``:120-122``)."""
    sigma = jnp.take(schedule.sigmas, step_index)
    return x_t / _bcast(jnp.sqrt(sigma**2 + 1.0), x_t.ndim)

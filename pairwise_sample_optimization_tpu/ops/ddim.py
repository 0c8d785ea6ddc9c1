"""DDIM step with Gaussian log-density (DDPO/D3PO heritage path).

Parity component for the reference's
``pso_pytorch/diffusers_patch/ddim_with_logprob.py`` (not called by the
current PSO trainers, but part of the library surface): a batched DDIM
reverse step with eta-scaled variance supporting epsilon / sample /
v-prediction parameterizations, returning the mean-over-dims Gaussian
log density of the realized (or provided) transition.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .gaussian import bcast as _bcast, gaussian_logprob_mean


def ddim_step_with_logprob(
    alphas_cumprod: jnp.ndarray,
    model_output: jnp.ndarray,
    timestep: jnp.ndarray,
    prev_timestep: jnp.ndarray,
    sample: jnp.ndarray,
    key: Optional[jax.Array] = None,
    prev_sample: Optional[jnp.ndarray] = None,
    eta: float = 1.0,
    prediction_type: str = "epsilon",
    clip_sample: bool = False,
    final_alpha_cumprod: float | None = None,
):
    """One DDIM reverse step x_t -> x_{t_prev} with log density.

    ``prev_timestep`` may be negative, in which case ``final_alpha_cumprod``
    (defaults to alphas_cumprod[0]) is used, matching diffusers semantics
    (ref ``ddim_with_logprob.py:22-32``).
    """
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)
    nd = sample.ndim

    a_t = jnp.take(alphas_cumprod, timestep)
    fac = alphas_cumprod[0] if final_alpha_cumprod is None else final_alpha_cumprod
    a_prev = jnp.where(
        prev_timestep >= 0,
        jnp.take(alphas_cumprod, jnp.maximum(prev_timestep, 0)),
        fac,
    )
    b_t = 1.0 - a_t

    a_t_b, a_prev_b, b_t_b = (_bcast(v, nd) for v in (a_t, a_prev, b_t))

    if prediction_type == "epsilon":
        pred_x0 = (sample - jnp.sqrt(b_t_b) * model_output) / jnp.sqrt(a_t_b)
        eps = model_output
    elif prediction_type == "sample":
        pred_x0 = model_output
        eps = (sample - jnp.sqrt(a_t_b) * pred_x0) / jnp.sqrt(b_t_b)
    elif prediction_type == "v_prediction":
        pred_x0 = jnp.sqrt(a_t_b) * sample - jnp.sqrt(b_t_b) * model_output
        eps = jnp.sqrt(a_t_b) * model_output + jnp.sqrt(b_t_b) * sample
    else:
        raise ValueError(f"unknown prediction_type: {prediction_type}")

    if clip_sample:
        pred_x0 = jnp.clip(pred_x0, -1.0, 1.0)

    variance = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
    std = eta * jnp.sqrt(jnp.maximum(variance, 0.0))  # (B,)
    std_b = _bcast(std, nd)

    direction = jnp.sqrt(jnp.maximum(1.0 - a_prev_b - std_b**2, 0.0)) * eps
    mean = jnp.sqrt(a_prev_b) * pred_x0 + direction

    if prev_sample is None:
        if key is None:
            raise ValueError("need a PRNG key when prev_sample is not provided")
        noise = jax.random.normal(key, mean.shape, dtype=jnp.float32)
        prev_sample = mean + std_b * noise
    else:
        prev_sample = prev_sample.astype(jnp.float32)

    # eta=0 makes the step deterministic (std 0): floor keeps the density
    # finite there, matching the reference's practical use
    std_safe = jnp.maximum(std_b, 1e-12)
    logprob = gaussian_logprob_mean(prev_sample, mean, std_safe)
    return prev_sample, logprob

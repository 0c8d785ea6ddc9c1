"""Noise-schedule tables for the few-step distilled samplers.

Pure table construction (NumPy at trace time, constants under jit). The
per-step Python ``.nonzero()`` timestep lookups of the reference
(``turbo_inference_with_logprob.py:61-64``) become static step indices:
samplers carry the step index alongside the raw timestep, so every lookup
is a batched ``take`` on a precomputed table — no data-dependent control
flow inside the compiled program.

All builders return HOST numpy arrays, never device arrays: closed over
by a jitted program, numpy constants embed from host memory at lowering,
whereas device-array constants force a device->host readback inside
``jax.jit(...).lower()`` — the exact call that died with
RESOURCE_EXHAUSTED when the chip was in its post-run drain state
(BENCH_r04). Entry points must be able to trace and lower without
touching the chip. ``jnp`` consumers (``jnp.take``, ``lax.scan`` xs,
arithmetic) accept numpy operands directly; only tracer *indexing* needs
an explicit ``jnp.asarray`` at the call site (see ``train/sampling.py``).

Schedule math matches the standard DDPM/karras conventions used by the
reference's diffusers schedulers (scaled-linear betas, trailing spacing):
- SDXL-Turbo: EulerAncestralDiscrete, beta in [0.00085, 0.012], 1000 train
  steps, trailing spacing -> 4-step timesteps [999, 749, 499, 249].
- SDXL-DMD2: fixed lattice t_i = round(i * 1000/n) - 1 for i = n..1
  (reference ``train_online_pso_sdxl_dmd2.py:542-548``).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseScheduleConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"  # or "linear", "squaredcos_cap_v2"
    timestep_spacing: str = "trailing"


def _betas(cfg: NoiseScheduleConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        return np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64) ** 2
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    if cfg.beta_schedule == "squaredcos_cap_v2":
        t = np.arange(n, dtype=np.float64)
        f = lambda s: np.cos((s / n + 0.008) / 1.008 * np.pi / 2) ** 2
        return np.minimum(1.0 - f(t + 1) / f(t), 0.999)
    raise ValueError(f"unknown beta_schedule: {cfg.beta_schedule}")


def make_alphas_cumprod(cfg: NoiseScheduleConfig = NoiseScheduleConfig()) -> np.ndarray:
    """(T,) cumulative alpha-bar table in float32 (host numpy)."""
    betas = _betas(cfg)
    return np.cumprod(1.0 - betas).astype(np.float32)


def make_karras_sigmas(
    num_train_timesteps: int = 1000,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    rho: float = 7.0,
) -> np.ndarray:
    """(T,) Karras et al. (2022) sigma ramp, ascending with index.

    Matches diffusers ``EDMEulerScheduler``'s training table (its
    ``sigmas`` are stored descending alongside descending timesteps; we
    store ascending-with-t so ``sigmas[t]`` pairs with timestep ``t`` the
    same way the VE table in :func:`make_alphas_cumprod` does).
    """
    ramp = np.linspace(0.0, 1.0, num_train_timesteps, dtype=np.float64)
    min_inv_rho = sigma_min ** (1.0 / rho)
    max_inv_rho = sigma_max ** (1.0 / rho)
    sigmas = (min_inv_rho + ramp * (max_inv_rho - min_inv_rho)) ** rho
    return sigmas.astype(np.float32)


def distill_timesteps(num_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """DMD2 fixed timestep lattice, descending: e.g. n=4 -> [999,749,499,249]."""
    step_ratio = num_train_timesteps // num_steps
    return (np.round(np.arange(num_steps, 0, -1, dtype=np.float64) * step_ratio) - 1).astype(
        np.int32
    )


class EulerAncestralSchedule(NamedTuple):
    """Static tables for an S-step Euler-ancestral (VE-SDE) sampler.

    ``sigmas`` has S+1 entries (last is 0); ``sigma_up``/``sigma_down`` are
    the ancestral split per step:
        sigma_up^2   = sigma_to^2 (sigma_from^2 - sigma_to^2) / sigma_from^2
        sigma_down^2 = sigma_to^2 - sigma_up^2
    (reference ``turbo_inference_with_logprob.py:77-80``).
    """

    timesteps: np.ndarray  # (S,) int32, descending (host numpy)
    sigmas: np.ndarray  # (S+1,) float32
    sigma_up: np.ndarray  # (S,) float32; 0 at the last (deterministic) step
    sigma_down: np.ndarray  # (S,) float32
    init_noise_sigma: np.ndarray  # scalar float32

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_euler_ancestral_schedule(
    num_inference_steps: int,
    cfg: NoiseScheduleConfig = NoiseScheduleConfig(),
) -> EulerAncestralSchedule:
    n = cfg.num_train_timesteps
    betas = _betas(cfg)
    alphas_cumprod = np.cumprod(1.0 - betas)
    sigmas_full = np.sqrt((1.0 - alphas_cumprod) / alphas_cumprod)

    if cfg.timestep_spacing == "trailing":
        step_ratio = n / num_inference_steps
        timesteps = (np.round(np.arange(n, 0, -step_ratio)) - 1).astype(np.int32)
    elif cfg.timestep_spacing == "linspace":
        timesteps = np.linspace(0, n - 1, num_inference_steps, dtype=np.float64)[::-1]
        timesteps = np.round(timesteps).astype(np.int32)
    elif cfg.timestep_spacing == "leading":
        step_ratio = n // num_inference_steps
        timesteps = (np.arange(0, num_inference_steps) * step_ratio)[::-1].astype(np.int32)
    else:
        raise ValueError(f"unknown timestep_spacing: {cfg.timestep_spacing}")

    sigmas = np.interp(timesteps.astype(np.float64), np.arange(n), sigmas_full)
    sigmas = np.concatenate([sigmas, [0.0]])

    s_from, s_to = sigmas[:-1], sigmas[1:]
    sigma_up_sq = s_to**2 * (s_from**2 - s_to**2) / s_from**2
    sigma_up = np.sqrt(sigma_up_sq)
    sigma_down = np.sqrt(s_to**2 - sigma_up_sq)

    if cfg.timestep_spacing in ("trailing", "linspace"):
        init_noise_sigma = sigmas.max()
    else:
        init_noise_sigma = np.sqrt(sigmas.max() ** 2 + 1)

    f32 = lambda a: np.asarray(a, dtype=np.float32)
    return EulerAncestralSchedule(
        timesteps=np.asarray(timesteps, dtype=np.int32),
        sigmas=f32(sigmas),
        sigma_up=f32(sigma_up),
        sigma_down=f32(sigma_down),
        init_noise_sigma=f32(init_noise_sigma),
    )

from .schedules import (
    NoiseScheduleConfig,
    make_alphas_cumprod,
    make_euler_ancestral_schedule,
    EulerAncestralSchedule,
    distill_timesteps,
)
from .euler_ancestral import (
    turbo_step_stats,
    turbo_step_with_logprob,
    turbo_logprob,
)
from .ddpm_renoise import (
    distilled_step_with_logprob,
    distilled_logprob,
    x0_from_eps,
)
from .ddim import ddim_step_with_logprob

__all__ = [
    "NoiseScheduleConfig",
    "make_alphas_cumprod",
    "make_euler_ancestral_schedule",
    "EulerAncestralSchedule",
    "distill_timesteps",
    "turbo_step_stats",
    "turbo_step_with_logprob",
    "turbo_logprob",
    "distilled_step_with_logprob",
    "distilled_logprob",
    "x0_from_eps",
    "ddim_step_with_logprob",
]

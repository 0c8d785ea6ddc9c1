"""Trajectory samplers: the reference's Python denoise loops as lax.scan.

Rebuilds ``sdxl_turbo_pipeline_with_logprob`` (reference
``sdxl_turbo_with_logprob.py:52-161``) and ``sdxl_dmd_pipeline_with_logprob``
(``sdxl_dmd_with_logprob.py:54-174``) as single compiled programs: the
denoising loop is a ``lax.scan`` over step indices, trajectories stay in
HBM, and the recorded tensors mirror the reference exactly:

- ``latents[t]`` for t in [0, S-1]   (current = [:-1], next = [1:])
- ``input_latents[t]`` (Euler-scaled UNet inputs) for t in [0, S-2]
- ``log_probs[t]`` for t in [0, S-2] (the last step is deterministic and
  is never trained on — reference drops it at ``:146-149``)

``eps_fn(x, step_or_t) -> eps`` closes over the UNet params + text
conditioning, so the same sampler serves policy and reference model.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops.ddim import ddim_step_with_logprob
from ..ops.ddpm_renoise import distilled_step_with_logprob, x0_from_eps
from ..ops.euler_ancestral import scale_model_input, turbo_step_with_logprob
from ..ops.schedules import EulerAncestralSchedule


class Trajectory(NamedTuple):
    """Stacked along a leading step axis; batch axis second."""

    final_latents: jnp.ndarray  # (B, h, w, C) — feed to VAE decode
    latents: jnp.ndarray  # (S, B, h, w, C): x_0 .. x_{S-1}
    input_latents: jnp.ndarray  # (S-1, B, h, w, C): scaled UNet inputs
    log_probs: jnp.ndarray  # (S-1, B)

    @property
    def current_latents(self):
        return self.latents[:-1]

    @property
    def next_latents(self):
        return self.latents[1:]


def sample_turbo_trajectories(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    schedule: EulerAncestralSchedule,
    init_latents: jnp.ndarray,  # (B, h, w, C) ~ N(0,1), pre-scaling
    key: jax.Array,
) -> Trajectory:
    """Full SDXL-Turbo stochastic rollout with per-step log-probs.

    ``init_latents`` are unit-normal draws; scaling by ``init_noise_sigma``
    happens here (reference ``:98-99``).
    """
    num_steps = schedule.num_steps
    batch = init_latents.shape[0]
    x0 = init_latents.astype(jnp.float32) * schedule.init_noise_sigma
    step_keys = jax.random.split(key, num_steps)
    # schedule tables are host numpy (ops/schedules.py) — numpy can't be
    # indexed by the traced scan counter, so convert once here (a free
    # constant under jit; never a device readback at lowering)
    timestep_table = jnp.asarray(schedule.timesteps)

    def body(x, scan_in):
        idx, k = scan_in
        idxs = jnp.full((batch,), idx, jnp.int32)
        x_in = scale_model_input(schedule, x, idxs)
        t = jnp.full((batch,), timestep_table[idx], jnp.int32)
        eps = eps_fn(x_in, t)
        x_next, logprob = turbo_step_with_logprob(schedule, eps, idxs, x, k)
        return x_next, (x, x_in, logprob)

    final, (xs, x_ins, logprobs) = jax.lax.scan(
        body, x0, (jnp.arange(num_steps), step_keys)
    )
    # xs = [x_0 .. x_{S-1}]; drop the last step's input/logprob (deterministic)
    return Trajectory(
        final_latents=final,
        latents=xs,
        input_latents=x_ins[:-1],
        log_probs=logprobs[:-1],
    )


def sample_dmd_trajectories(
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    alphas_cumprod: jnp.ndarray,
    timesteps: jnp.ndarray,  # (S,) int32 descending lattice
    init_latents: jnp.ndarray,  # (B, h, w, C) ~ N(0,1)
    key: jax.Array,
    shared_noise: bool = True,
    transition_noise: jnp.ndarray | None = None,
) -> Trajectory:
    """SDXL-DMD2 rollout: DDPM re-noise transitions, deterministic final x0.

    DMD2's LCM-style ``init_noise_sigma`` is 1.0, so ``init_latents`` are
    used as-is. ``input_latents`` equals ``latents`` here (no Euler input
    scaling for the VP-parameterized distilled model) — kept so the train
    loop is sampler-agnostic. ``transition_noise`` (S-1, B, h, w, C)
    overrides the internal per-step draw (per-sample-keyed eval).
    """
    num_steps = int(timesteps.shape[0])
    batch = init_latents.shape[0]
    x0 = init_latents.astype(jnp.float32)
    step_keys = jax.random.split(key, num_steps - 1)
    timesteps = jnp.asarray(timesteps)  # host-numpy lattice -> traceable index

    def body(x, scan_in):
        i, k, nz = scan_in
        t = jnp.full((batch,), timesteps[i], jnp.int32)
        t_prev = jnp.full((batch,), timesteps[i + 1], jnp.int32)
        eps = eps_fn(x, t)
        x_next, logprob = distilled_step_with_logprob(
            alphas_cumprod, eps, t, t_prev, x, k,
            shared_noise=shared_noise, noise=nz,
        )
        return x_next, (x, logprob)

    if transition_noise is None:
        scan_noise = jnp.zeros((num_steps - 1, 0))  # placeholder leaf

        def body_wrap(x, scan_in):
            i, k, _ = scan_in
            return body(x, (i, k, None))
    else:
        scan_noise = transition_noise.astype(jnp.float32)
        body_wrap = body

    x_last, (xs, logprobs) = jax.lax.scan(
        body_wrap, x0, (jnp.arange(num_steps - 1), step_keys, scan_noise)
    )
    # final deterministic step: x0 prediction at the last lattice timestep
    t_last = jnp.full((batch,), timesteps[-1], jnp.int32)
    eps_last = eps_fn(x_last, t_last)
    pred_x0 = x0_from_eps(x_last, eps_last, alphas_cumprod, t_last)

    latents = jnp.concatenate([xs, x_last[None]], axis=0)  # x_0 .. x_{S-1}
    return Trajectory(
        final_latents=pred_x0,
        latents=latents,
        input_latents=latents[:-1],
        log_probs=logprobs,
    )


def sample_ddim_cfg_trajectories(
    eps_cfg_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    alphas_cumprod: jnp.ndarray,
    timesteps: jnp.ndarray,  # (S,) int32 descending
    init_latents: jnp.ndarray,
    key: jax.Array,
    eta: float = 1.0,
) -> Trajectory:
    """DDIM rollout with logprobs (SD1.x D3PO/DDPO heritage path; reference
    ``pipeline_with_logprob.py``). ``eps_cfg_fn`` is the CFG-combined
    epsilon prediction (the caller mixes cond/uncond); every step is
    stochastic (eta-scaled), so all S transitions carry logprobs.
    """
    num_steps = int(timesteps.shape[0])
    batch = init_latents.shape[0]
    x0 = init_latents.astype(jnp.float32)
    step_keys = jax.random.split(key, num_steps)
    timesteps = jnp.asarray(timesteps)  # host-numpy lattice -> traceable index
    # prev timestep for the final step goes negative -> final_alpha_cumprod
    prev_ts = jnp.concatenate([timesteps[1:], jnp.asarray([-1], timesteps.dtype)])

    def body(x, scan_in):
        i, k = scan_in
        t = jnp.full((batch,), timesteps[i], jnp.int32)
        tp = jnp.full((batch,), prev_ts[i], jnp.int32)
        eps = eps_cfg_fn(x, t)
        x_next, logprob = ddim_step_with_logprob(
            alphas_cumprod, eps, t, tp, x, key=k, eta=eta
        )
        return x_next, (x, logprob)

    final, (xs, logprobs) = jax.lax.scan(
        body, x0, (jnp.arange(num_steps), step_keys)
    )
    # S+1 states: current = latents[:-1] (S), next = latents[1:] (S) — all
    # S transitions are stochastic and trained, unlike the distilled paths
    latents = jnp.concatenate([xs, final[None]], axis=0)
    return Trajectory(
        final_latents=final,
        latents=latents,
        input_latents=latents[:-1],
        log_probs=logprobs,
    )

"""Offline / DreamBooth PSO: winner = user instance images, loser =
self-generated negatives; Diffusion-DPO-style MSE-difference loss.

Rebuild of reference ``personalization/train_pso_sdxl_turbo_dreambooth.py``
core semantics (``:1692-1999``):

- shared noise across the win/lose halves (``noise.chunk(2)[0].repeat``,
  ``:1763``);
- Turbo 4-point timestep lattice ``t = stride*(u mod 4) + stride - 1``
  (``:1769-1781``), shared across halves;
- sigma-space noising ``x_t = x0 + sigma * n`` with Euler preconditioning
  ``x_t / sqrt(sigma^2+1)`` and epsilon postconditioning
  ``x0_pred = pred * (-sigma) + x_t`` (the non-"EDM" branch of
  ``:1791-1796,1846-1865``);
- per-sample weighted MSE to the x0 target with ``weighting = sigma^-2``
  (``:1884-1892``), win/lose difference, logistic (``pso``) or hinge
  (``pso_db``) loss + prior preservation (``losses.dreambooth_pso_loss``).

Policy + frozen-reference passes are fused into one 2x-batch UNet apply
via per-sample lora scales (the ``pso`` loss needs both; ``pso_db`` skips
the reference half entirely).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.schedules import NoiseScheduleConfig, make_alphas_cumprod
from .losses import dreambooth_pso_loss
from .train_state import PSOTrainState


@dataclasses.dataclass(frozen=True)
class DreamBoothPSOConfig:
    loss_type: str = "pso_db"  # "pso" | "pso_db"
    beta: float = 5.0
    neg_defactor: float = 1.0
    prior_loss_weight: float = 0.5
    distill_train_timesteps: int = 4  # turbo lattice points
    num_train_timesteps: int = 1000
    snr_clip: float = 1e8  # guard for sigma^-2 weighting


def make_sigma_table(cfg: NoiseScheduleConfig = NoiseScheduleConfig()) -> jnp.ndarray:
    """(T,) full VE sigma table: sigma_t = sqrt((1-abar)/abar)."""
    ac = make_alphas_cumprod(cfg)
    return jnp.sqrt((1.0 - ac) / ac)


def sample_lattice_timesteps(
    key: jax.Array, batch: int, num_train_timesteps: int, lattice_points: int
) -> jnp.ndarray:
    """Reference ``:1769-1781``: uniform u then fold onto the 4-point grid."""
    u = jax.random.randint(key, (batch,), 0, num_train_timesteps)
    stride = num_train_timesteps // lattice_points
    return stride * (u % lattice_points) + stride - 1


class DreamBoothPSOTrainer:
    def __init__(
        self,
        config: DreamBoothPSOConfig,
        unet_apply: Callable[..., jnp.ndarray],
        tx,
        schedule_config: NoiseScheduleConfig = NoiseScheduleConfig(),
    ):
        self.config = config
        self.unet_apply = unet_apply
        self.tx = tx
        self.sigmas = make_sigma_table(schedule_config)
        self._update = jax.jit(self._update_impl, donate_argnums=(0,))

    def _losses_for(self, variables, noisy, latents2, cond2, timesteps2, sig_b, scale):
        inp = noisy / jnp.sqrt(sig_b**2 + 1.0)  # Euler precondition
        pred = self.unet_apply(variables, inp, timesteps2, cond2, scale)
        x0_pred = pred * (-sig_b) + noisy  # epsilon postcondition
        weighting = sig_b ** (-2.0)
        per = jnp.mean(
            (weighting * jnp.square(x0_pred - latents2)).reshape(noisy.shape[0], -1),
            axis=1,
        )
        return per

    def _update_impl(self, state: PSOTrainState, params, batch, key):
        """One optimizer step.

        batch: dict with
          instance_latents (b, h, w, c) — winner x0 latents (VAE-encoded)
          negative_latents (b, h, w, c) — loser x0 latents
          cond: dict leaves (b, ...) — shared text conditioning
        """
        cfg = self.config
        b = batch["instance_latents"].shape[0]
        k_t, k_n = jax.random.split(key)

        latents2 = jnp.concatenate(
            [batch["instance_latents"], batch["negative_latents"]], axis=0
        ).astype(jnp.float32)
        cond2 = jax.tree.map(
            lambda x: jnp.concatenate([x, x], axis=0), batch["cond"]
        )
        t = sample_lattice_timesteps(
            k_t, b, cfg.num_train_timesteps, cfg.distill_train_timesteps
        )
        t2 = jnp.tile(t, 2)  # shared lattice across win/lose halves
        noise_half = jax.random.normal(k_n, batch["instance_latents"].shape, jnp.float32)
        noise2 = jnp.tile(noise_half, (2, 1, 1, 1))  # shared noise (ref :1763)

        sigma2 = jnp.take(self.sigmas, t2)
        sig_b = sigma2.reshape(-1, 1, 1, 1)
        noisy2 = latents2 + sig_b * noise2  # sigma-space forward process

        def loss_fn(lora):
            variables = {"params": params, "lora": lora}
            if cfg.loss_type == "pso":
                # fused policy+reference apply: (4b,) with scales [1,1,0,0]
                noisy4 = jnp.concatenate([noisy2, noisy2], 0)
                lat4 = jnp.concatenate([latents2, latents2], 0)
                t4 = jnp.tile(t2, 2)
                cond4 = jax.tree.map(
                    lambda x: jnp.tile(x, (2,) + (1,) * (x.ndim - 1)), cond2
                )
                sig4 = jnp.concatenate([sig_b, sig_b], 0)
                scale4 = jnp.concatenate(
                    [jnp.ones((2 * b,), jnp.float32), jnp.zeros((2 * b,), jnp.float32)]
                )
                per4 = self._losses_for(
                    variables, noisy4, lat4, cond4, t4, sig4, scale4
                )
                per_pol, per_ref = jnp.split(per4, 2)
                per_ref = jax.lax.stop_gradient(per_ref)
                mw, ml = jnp.split(per_pol, 2)
                rw, rl = jnp.split(per_ref, 2)
            else:
                per = self._losses_for(
                    variables, noisy2, latents2, cond2, t2, sig_b, 1.0
                )
                mw, ml = jnp.split(per, 2)
                rw = rl = None
            loss, logits = dreambooth_pso_loss(
                mw,
                ml,
                rw,
                rl,
                beta=cfg.beta,
                loss_type=cfg.loss_type,
                neg_defactor=cfg.neg_defactor,
                prior_loss_weight=cfg.prior_loss_weight,
            )
            aux = {
                "loss": loss,
                "win_loss": jnp.mean(mw),
                "lose_loss": jnp.mean(ml),
                "implicit_acc": jnp.mean((logits > 0).astype(jnp.float32)),
            }
            return loss, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.lora)
        new_state = state.apply_gradients(grads, self.tx)
        return new_state, aux

    def update(self, state, params, batch, key):
        return self._update(state, params, batch, key)

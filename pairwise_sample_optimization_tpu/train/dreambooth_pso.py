"""Offline / DreamBooth PSO: winner = user instance images, loser =
self-generated negatives; Diffusion-DPO-style MSE-difference loss.

Rebuild of reference ``personalization/train_pso_sdxl_turbo_dreambooth.py``
core semantics (``:1692-1999``):

- shared noise across the win/lose halves (``noise.chunk(2)[0].repeat``,
  ``:1763``);
- Turbo 4-point timestep lattice ``idx = stride*(u mod 4) + stride - 1``
  (``:1769-1781``). The lattice values index the scheduler's DESCENDING
  timestep table (``noise_scheduler.timesteps[indices]``, ``:1782``), so
  the *effective* trained timesteps are ``T-1-idx`` ({0,250,500,750} for
  the 4-point grid) — replicated here via ``descending_table=True``
  (``"direct"`` indexing kept as the intuitive variant);
- three scheduler spaces (``:1229-1240`` auto-detection):
  * ``euler_edm`` — EDM-style training on EulerDiscrete (the branch the
    launch scripts actually run via ``--do_edm_style_training``,
    ``scripts/pso_dog.sh:35``): sigma-space noising ``x_t = x0 + sigma*n``,
    input precondition ``x_t / sqrt(sigma^2+1)`` (``:1796``), epsilon
    postcondition ``x0_pred = pred*(-sigma) + x_t`` or v-prediction
    (``:1852-1857``), target x0, ``weighting = sigma^-2`` (``:1865``);
  * ``edm`` — EDMEulerScheduler preconditioning (``:1794,1851``):
    Karras sigmas, ``c_in = 1/sqrt(sigma^2+sigma_data^2)``, timestep
    conditioning ``c_noise = 0.25*ln(sigma)``, output
    ``x0_pred = c_skip*x_t + c_out*pred``. NOTE: in the reference this
    branch leaves ``weighting=None`` and crashes at ``:1886``
    (``weighting.float()``) — we implement the formulas with weighting 1;
  * ``ddpm`` — no EDM-style flag (``:1240``): VP noising
    ``sqrt(abar)x0 + sqrt(1-abar)n``, raw epsilon/velocity target. Same
    reference ``weighting=None`` defect; weighting 1 here.
- per-sample weighted MSE, win/lose difference, logistic (``pso``) or
  hinge (``pso_db``) loss + prior preservation (``:1884-1935``) via
  ``losses.dreambooth_pso_loss``;
- gradient accumulation: grads are summed over ``grad_accum`` microbatches
  before one optimizer step (Accelerate ``accumulate``, ``:1123,1720``) —
  a ``lax.scan`` over a leading microbatch axis, one jitted program;
- optional text-encoder LoRA training (``--train_text_encoder``,
  ``:1330-1339``): the trainable tree becomes
  ``{"unet": ..., "te1": ..., "te2": ...}`` and prompts are re-encoded
  inside the loss (``:1827-1838``). The frozen-reference pass disables
  only the UNet adapters (``:1894-1896``) — the reference model consumes
  the *policy* text embeddings, exactly like the reference.

Policy + frozen-reference passes are fused into one 2x-batch UNet apply
via per-sample lora scales (the ``pso`` loss needs both; ``pso_db`` skips
the reference half entirely).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.schedules import (
    NoiseScheduleConfig,
    make_alphas_cumprod,
    make_karras_sigmas,
)
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
    # "euler_edm" (the runnable reference branch) | "edm" | "ddpm"
    scheduler_space: str = "euler_edm"
    prediction_type: str = "epsilon"  # "epsilon" | "v_prediction"
    # reference parity: lattice values index the descending timestep table
    descending_table: bool = True
    sigma_data: float = 0.5  # EDM c_in/c_skip/c_out constant
    grad_accum: int = 1
    train_text_encoder: bool = False
    snr_clip: float = 1e8  # guard for sigma^-2 weighting
    # fuse the frozen-reference pass of the "pso" loss into one 4b apply
    # with per-sample lora scales [1,1,0,0]. Must be False with DoRA
    # adapters (magnitude normalization is weight-space — a per-sample
    # scale vector cannot express the reference half).
    fuse_ref_pass: bool = True


def make_sigma_table(cfg: NoiseScheduleConfig = NoiseScheduleConfig()) -> np.ndarray:
    """(T,) full VE sigma table: sigma_t = sqrt((1-abar)/abar) (host numpy)."""
    ac = make_alphas_cumprod(cfg)
    return np.sqrt((1.0 - ac) / ac).astype(np.float32)


def sample_lattice_timesteps(
    key: jax.Array, batch: int, num_train_timesteps: int, lattice_points: int
) -> jnp.ndarray:
    """Reference ``:1769-1781``: uniform u then fold onto the 4-point grid.

    Returns lattice *index* values ({249,499,749,999} for 4 points); the
    trainer maps them onto effective timesteps per ``descending_table``.
    """
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
        encode_prompt: Optional[Callable] = None,
        mesh=None,
    ):
        """``encode_prompt(te_params, te_loras, ids1, ids2) -> cond`` is
        required when ``config.train_text_encoder`` — it must apply the
        text towers with the given LoRA collections (gradients flow
        through it into the TE adapters).

        ``mesh``: a ``jax.sharding.Mesh`` for data parallelism — batches
        are sharded over ``data`` in :meth:`update` and XLA psums the
        grads, the TPU-native equivalent of the reference's
        ``accelerate``-DDP DreamBooth run (multi-host aware)."""
        self.config = config
        self.unet_apply = unet_apply
        self.tx = tx
        self.encode_prompt = encode_prompt
        self.mesh = mesh
        if config.train_text_encoder and encode_prompt is None:
            raise ValueError("train_text_encoder=True needs encode_prompt")
        if config.scheduler_space not in ("euler_edm", "edm", "ddpm"):
            raise ValueError(f"unknown scheduler_space {config.scheduler_space}")
        if config.prediction_type not in ("epsilon", "v_prediction"):
            raise ValueError(f"unknown prediction_type {config.prediction_type}")
        if config.scheduler_space == "edm":
            self.sigmas = make_karras_sigmas(config.num_train_timesteps)
        else:
            self.sigmas = make_sigma_table(schedule_config)
        self.alphas_cumprod = make_alphas_cumprod(schedule_config)
        self._update = jax.jit(self._update_impl, donate_argnums=(0,))

    # ------------------------------------------------------------------ #
    # scheduler-space branches
    # ------------------------------------------------------------------ #

    def _noise_and_precondition(self, latents, noise, t_eff):
        """-> (unet_input, t_cond, noisy, target, weighting, post_fn).

        ``post_fn(pred, noisy) -> prediction in target space``. All math in
        fp32; shapes (b2, h, w, c) with t_eff (b2,) int32.
        """
        cfg = self.config
        if cfg.scheduler_space in ("euler_edm", "edm"):
            sig = jnp.take(self.sigmas, t_eff).reshape(-1, 1, 1, 1)
            noisy = latents + sig * noise
            target = latents
            if cfg.scheduler_space == "euler_edm":
                inp = noisy / jnp.sqrt(sig**2 + 1.0)
                t_cond = t_eff.astype(jnp.float32)
                weighting = jnp.minimum(sig ** (-2.0), cfg.snr_clip)
                if cfg.prediction_type == "epsilon":
                    post = lambda pred, x_t: pred * (-sig) + x_t
                else:  # v_prediction (:1855-1857)
                    post = lambda pred, x_t: pred * (
                        -sig / jnp.sqrt(sig**2 + 1.0)
                    ) + x_t / (sig**2 + 1.0)
            else:  # EDMEuler preconditioning (:1794,1851)
                sd = cfg.sigma_data
                inp = noisy / jnp.sqrt(sig**2 + sd**2)
                t_cond = 0.25 * jnp.log(jnp.take(self.sigmas, t_eff))  # c_noise
                weighting = jnp.ones_like(sig)
                c_skip = sd**2 / (sig**2 + sd**2)
                sign = 1.0 if cfg.prediction_type == "epsilon" else -1.0
                c_out = sign * sig * sd / jnp.sqrt(sig**2 + sd**2)
                post = lambda pred, x_t: c_skip * x_t + c_out * pred
        else:  # ddpm
            abar = jnp.take(self.alphas_cumprod, t_eff).reshape(-1, 1, 1, 1)
            sa, sb = jnp.sqrt(abar), jnp.sqrt(1.0 - abar)
            noisy = sa * latents + sb * noise
            inp = noisy
            t_cond = t_eff.astype(jnp.float32)
            weighting = jnp.ones_like(abar)
            if cfg.prediction_type == "epsilon":
                target = noise
            else:  # velocity = sqrt(abar)*n - sqrt(1-abar)*x0
                target = sa * noise - sb * latents
            post = lambda pred, x_t: pred
        return inp, t_cond, noisy, target, weighting, post

    def _weighted_mse(self, pred, target, weighting):
        b = pred.shape[0]
        return jnp.mean(
            (weighting * jnp.square(pred - target)).reshape(b, -1), axis=1
        )

    # ------------------------------------------------------------------ #
    # update
    # ------------------------------------------------------------------ #

    def _unet_lora(self, lora):
        return lora["unet"] if self.config.train_text_encoder else lora

    def _microbatch_loss(self, lora, params, batch, key):
        cfg = self.config
        b = batch["instance_latents"].shape[0]
        k_t, k_n = jax.random.split(key)

        latents2 = jnp.concatenate(
            [batch["instance_latents"], batch["negative_latents"]], axis=0
        ).astype(jnp.float32)
        if cfg.train_text_encoder:
            unet_params, te_params = params["unet"], params
            cond = self.encode_prompt(
                te_params,
                {"te1": lora["te1"], "te2": lora["te2"]},
                batch["input_ids_one"],
                batch["input_ids_two"],
            )
        else:
            unet_params = params
            cond = batch["cond"]
        cond2 = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), cond)
        if "time_ids_win" in batch:
            # per-image SDXL micro-conditioning: the win half carries the
            # dataset's recorded (original_size, crop_top_left) per view,
            # the lose half the generator's defaults (reference passes
            # per-image add_time_ids through its collate)
            cond2 = dict(
                cond2,
                time_ids=jnp.concatenate(
                    [batch["time_ids_win"], batch["time_ids_lose"]], axis=0
                ),
            )

        idx = sample_lattice_timesteps(
            k_t, b, cfg.num_train_timesteps, cfg.distill_train_timesteps
        )
        t_eff = (cfg.num_train_timesteps - 1 - idx) if cfg.descending_table else idx
        t2 = jnp.tile(t_eff, 2)  # shared lattice across win/lose halves
        noise_half = jax.random.normal(k_n, batch["instance_latents"].shape, jnp.float32)
        noise2 = jnp.tile(noise_half, (2, 1, 1, 1))  # shared noise (ref :1763)

        unet_lora = self._unet_lora(lora)

        def apply_and_mse(latents, noise, t_eff, c_in, scale):
            inp, t_cond, noisy, target, wgt, post = self._noise_and_precondition(
                latents, noise, t_eff
            )
            variables = {"params": unet_params, "lora": unet_lora}
            pred = self.unet_apply(variables, inp, t_cond, c_in, scale)
            return self._weighted_mse(post(pred, noisy), target, wgt)

        if cfg.loss_type == "pso":
            if cfg.fuse_ref_pass:
                # fused policy+reference apply: (4b,) with scales [1,1,0,0]
                cat = lambda x: jnp.concatenate([x, x], 0)
                cond4 = jax.tree.map(
                    lambda x: jnp.tile(x, (2,) + (1,) * (x.ndim - 1)), cond2
                )
                scale4 = jnp.concatenate(
                    [jnp.ones((2 * b,), jnp.float32), jnp.zeros((2 * b,), jnp.float32)]
                )
                per4 = apply_and_mse(
                    cat(latents2), cat(noise2), jnp.tile(t2, 2), cond4, scale4
                )
                per_pol, per_ref = jnp.split(per4, 2)
                per_ref = jax.lax.stop_gradient(per_ref)
            else:
                # unfused: separate grad-free reference forward with a
                # STATIC zero scale (adapters statically skipped — the
                # DoRA-compatible form of disable_adapters)
                per_pol = apply_and_mse(latents2, noise2, t2, cond2, 1.0)
                per_ref = jax.lax.stop_gradient(
                    apply_and_mse(latents2, noise2, t2, cond2, 0.0)
                )
            mw, ml = jnp.split(per_pol, 2)
            rw, rl = jnp.split(per_ref, 2)
        else:
            per = apply_and_mse(latents2, noise2, t2, cond2, 1.0)
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

    def _update_impl(self, state: PSOTrainState, params, batch, key):
        """One optimizer step over ``grad_accum`` microbatches.

        batch: dict with, per microbatch,
          instance_latents (b, h, w, c) — winner x0 latents (VAE-encoded)
          negative_latents (b, h, w, c) — loser x0 latents
          cond: dict leaves (b, ...) — precomputed text conditioning, OR
          input_ids_one/two (b, 77) when ``train_text_encoder``.
        With ``grad_accum > 1`` every leaf carries a leading (ga,) axis.
        """
        ga = self.config.grad_accum
        grad_fn = jax.grad(self._microbatch_loss, has_aux=True)
        if ga <= 1:
            grads, aux = grad_fn(state.lora, params, batch, key)
        else:
            keys = jax.random.split(key, ga)

            def body(acc, mb_key):
                mb, k = mb_key
                g, aux = grad_fn(state.lora, params, mb, k)
                return jax.tree.map(jnp.add, acc, g), aux

            zeros = jax.tree.map(jnp.zeros_like, state.lora)
            grads, auxes = jax.lax.scan(body, zeros, (batch, keys))
            # mean-of-sums matches Accelerate's accumulate averaging
            grads = jax.tree.map(lambda g: g / ga, grads)
            aux = jax.tree.map(lambda a: jnp.mean(a, axis=0), auxes)
        new_state = state.apply_gradients(grads, self.tx)
        return new_state, aux

    def update(self, state, params, batch, key):
        if self.mesh is not None:
            from ..parallel.mesh import shard_global_batch

            # leading axis is grad-accum (scanned) when ga > 1; the
            # device-batch axis behind it is what shards over ``data``
            batch = shard_global_batch(
                self.mesh, batch, axis=1 if self.config.grad_accum > 1 else 0
            )
        return self._update(state, params, batch, key)

"""Online PSO: sample trajectory pairs -> reward-rank -> DPO-style update.

The reference's epoch (``train_online_pso_sdxl_turbo.py:544-902``) is a
Python loop of per-step UNet calls, a PIL round-trip to the reward model,
and 4 separate UNet passes per microbatch. Here each phase is one compiled
program over the mesh:

- ``sample_pairs``: both trajectories batched together (2B) through a
  ``lax.scan`` denoise; VAE decode and the reward model consume the
  decoded tensor in-graph — trajectories never leave HBM.
- ``train_update``: one optimizer step; scans over the
  ``grad_accum x num_train_timesteps`` microbatches of the reference's
  accumulation window. Policy and frozen-reference UNet passes are fused
  into a single 4b-batch apply using a per-sample ``lora_scale`` vector
  ([1,1,0,0]) — the reference's 4 sequential passes + adapter toggling
  (``:775-805``) become one MXU-saturating call.
- gradients reduce over the ``data`` mesh axis via sharded jit (XLA
  inserts the psum), replacing DDP allreduce.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops.ddpm_renoise import distilled_logprob
from ..ops.euler_ancestral import turbo_logprob
from ..ops.schedules import (
    distill_timesteps,
    make_alphas_cumprod,
    make_euler_ancestral_schedule,
)
from .losses import pareto_compare, pso_pairwise_loss, sample_compare
from .sampling import sample_dmd_trajectories, sample_turbo_trajectories
from .train_state import PSOTrainState


@dataclasses.dataclass(frozen=True)
class OnlinePSOConfig:
    sampler: str = "turbo"  # "turbo" | "dmd"
    num_steps: int = 4
    beta: float = 50.0
    eps: float = 0.1
    train_batch_size: int = 4
    grad_accum: int = 2
    num_inner_epochs: int = 1
    # preference rule: turbo uses per-sample random axis, dmd strict Pareto
    compare: str = "sample"  # "sample" | "pareto"
    # "ratio" = reference parity (clamp exp before log); "logratio" =
    # fixed variant; "none" = plain DPO
    clamp_mode: str = "ratio"
    shared_noise: bool = True  # dmd-only quirk flag
    num_train_timesteps: int | None = None  # default: num_steps - 1
    # fuse the frozen-reference pass into the policy apply (4b batch, one
    # call). False runs the ref half as a separate grad-free forward —
    # measured FASTER on v5e (the fused variant drags the ref half
    # through backward+remat: ~35% more update FLOPs, BENCHMARKS.md) and
    # halves backward activation memory (needed at 1024^2 on 16GB chips).
    fuse_ref_pass: bool = False
    # train the full UNet instead of LoRA (reference ``use_lora=False``,
    # ``config_sdxl_turbo_dpo.py:36-38``): the trainable tree is the whole
    # param tree and the frozen reference is a SEPARATE weight copy (the
    # lora_scale=0 trick no longer applies) — doubles UNet HBM.
    full_finetune: bool = False
    # run the grad-free frozen-reference forward (2 of the reference's 4
    # UNet passes/microbatch, ``train_online_pso_sdxl_turbo.py:775-805``)
    # through dynamic-int8 matmuls/convs (ops.qconv.int8_ref_pass): the
    # v5e MXU runs int8 at ~2x bf16. Accuracy/throughput trade like the
    # int8 VAE decode — opt-in pending qualification (BENCHMARKS.md).
    int8_ref_pass: bool = False

    def __post_init__(self):
        if self.num_steps < 2:
            raise ValueError(
                "online PSO needs >= 2 sampling steps (the single step of a "
                "1-step sampler is deterministic — nothing stochastic to train)"
            )
        if self.num_train_timesteps and self.num_train_timesteps > self.num_steps - 1:
            raise ValueError(
                f"num_train_timesteps={self.num_train_timesteps} exceeds the "
                f"{self.num_steps - 1} recorded stochastic transitions — "
                "traced indexing would silently clamp and train the last "
                "transition twice"
            )
        if self.full_finetune and self.fuse_ref_pass:
            raise ValueError(
                "full_finetune needs fuse_ref_pass=False: policy and reference "
                "run different weights, so the per-sample lora_scale fusion "
                "cannot express the reference pass"
            )
        if self.int8_ref_pass and self.fuse_ref_pass:
            raise ValueError(
                "int8_ref_pass needs fuse_ref_pass=False: the fused 4b apply "
                "runs policy and reference through the same ops, so the "
                "reference half cannot be quantized separately"
            )

    @property
    def train_timesteps(self) -> int:
        return self.num_train_timesteps or (self.num_steps - 1)


class OnlinePSOTrainer:
    """Builds the jitted sample/update programs for one model family.

    Args:
      unet_apply: f(variables, x, t, lora_scale) -> eps, closing over text
        conditioning is the caller's job via ``cond``; here it takes
        cond explicitly: f(variables, x, t, cond, lora_scale) -> eps.
      decode_fn: f(latents) -> images in [-1, 1], or None to skip decode.
      reward_fn: f(images, reward_cond) -> (B, M) rewards, or None
        (rewards supplied externally, e.g. host-side scorers).
    """

    def __init__(
        self,
        config: OnlinePSOConfig,
        unet_apply: Callable[..., jnp.ndarray],
        tx,
        decode_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
        reward_fn: Optional[Callable[..., jnp.ndarray]] = None,
        latent_hw: int = 64,
        latent_channels: int = 4,
        donate: bool = True,
        mesh=None,
    ):
        self.config = config
        self.unet_apply = unet_apply
        self.tx = tx
        self.decode_fn = decode_fn
        self.reward_fn = reward_fn
        self.latent_hw = latent_hw
        self.latent_channels = latent_channels
        # jax.sharding.Mesh for data-parallel update batches: when set,
        # train_epoch places each (grad_accum, train_bs, ...) slice with
        # the per-device batch axis sharded over ``data`` so the jitted
        # update runs SPMD and XLA psums the grads (the DDP-allreduce
        # equivalent, reference ``train_online_pso_sdxl_turbo.py:857``)
        self.mesh = mesh

        if config.sampler == "turbo":
            self.schedule = make_euler_ancestral_schedule(config.num_steps)
            self.timestep_table = self.schedule.timesteps
            self.alphas_cumprod = None
        elif config.sampler == "dmd":
            self.schedule = None
            # host numpy (like the turbo schedule tables): baked as jit
            # constants without a device readback at lowering
            self.timestep_table = distill_timesteps(config.num_steps)
            self.alphas_cumprod = make_alphas_cumprod()
            self.step_ratio = 1000 // config.num_steps
        else:
            raise ValueError(config.sampler)

        self._sample = jax.jit(self._sample_pairs_impl)
        donate_args = (0,) if donate else ()
        self._update = jax.jit(self._update_impl, donate_argnums=donate_args)

    # ------------------------------------------------------------------ #
    # sampling phase
    # ------------------------------------------------------------------ #

    def _eps_fn(self, variables, cond, lora_scale):
        def f(x, t):
            return self.unet_apply(variables, x, t, cond, lora_scale)

        return f

    def _sample_pairs_impl(self, variables, cond, reward_cond, key, aux_variables):
        """Sample a pair of trajectories per prompt; returns samples dict.

        ``cond`` leaves must have leading batch dim B; they are tiled to 2B
        (trajectory-major: [traj0 batch | traj1 batch]).
        """
        cfg = self.config
        b = jax.tree.leaves(cond)[0].shape[0]
        cond2 = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), cond)
        k_init, k_step = jax.random.split(key)
        init = jax.random.normal(
            k_init,
            (2 * b, self.latent_hw, self.latent_hw, self.latent_channels),
            dtype=jnp.float32,
        )
        eps_fn = self._eps_fn(variables, cond2, 1.0)
        if cfg.sampler == "turbo":
            traj = sample_turbo_trajectories(eps_fn, self.schedule, init, k_step)
        else:
            tn = None
            if cfg.shared_noise:
                # reference parity: each trajectory of the pair is a
                # SEPARATE pipeline call there, so the (1,C,H,W)
                # batch-shared re-noise draw differs BETWEEN the pair's
                # trajectories (``distilled_inference_with_logprob.py
                # :121-126``; two sequential generator draws). One draw
                # over the whole 2B batch would correlate the pair far
                # beyond the reference (more Pareto ties, weaker signal).
                k_step, k_tn = jax.random.split(k_step)
                hw, c = self.latent_hw, self.latent_channels
                s = cfg.num_steps - 1
                tn = jax.random.normal(
                    k_tn, (s, 2, 1, hw, hw, c), dtype=jnp.float32
                )
                tn = jnp.broadcast_to(tn, (s, 2, b, hw, hw, c)).reshape(
                    s, 2 * b, hw, hw, c
                )
            traj = sample_dmd_trajectories(
                eps_fn,
                self.alphas_cumprod,
                self.timestep_table,
                init,
                k_step,
                shared_noise=cfg.shared_noise,
                transition_noise=tn,
            )

        t_axis = cfg.num_steps - 1  # trained transitions

        def to_bp(x):  # (T, 2B, ...) -> (B, 2, T, ...)
            x = jnp.moveaxis(x, 0, 1)  # (2B, T, ...)
            return x.reshape(2, b, *x.shape[1:]).swapaxes(0, 1)

        samples = {
            "latents": to_bp(traj.current_latents),  # (B,2,T,h,w,c)
            "next_latents": to_bp(traj.next_latents),
            "input_latents": to_bp(traj.input_latents),
            "log_probs": to_bp(traj.log_probs[..., None])[..., 0],  # (B,2,T)
            "step_indices": jnp.tile(jnp.arange(t_axis, dtype=jnp.int32), (b, 1)),
            "timesteps": jnp.tile(self.timestep_table[:t_axis], (b, 1)),
        }

        images = None
        if self.decode_fn is not None:
            if aux_variables is None:
                images = self.decode_fn(traj.final_latents)  # (2B, H, W, 3)
            else:
                images = self.decode_fn(traj.final_latents, aux_variables)
            if self.reward_fn is not None:
                rc2 = jax.tree.map(
                    lambda x: jnp.concatenate([x, x], 0), reward_cond
                )
                if aux_variables is None:
                    r = self.reward_fn(images, rc2)
                else:
                    r = self.reward_fn(images, rc2, aux_variables)
                if r.ndim == 1:
                    r = r[:, None]
                samples["rewards"] = r.reshape(2, b, -1).swapaxes(0, 1)  # (B,2,M)
        return samples, images

    def sample_pairs(self, variables, cond, reward_cond, key, aux_variables=None):
        """``aux_variables``: weight pytree for decode_fn/reward_fn (e.g.
        ``{"vae": ..., "scorer": ...}``) passed as a jit ARGUMENT — a
        closure capture would bake GBs of weights into the executable as
        constants (duplicated HBM + slow compiles). When given, decode_fn
        and reward_fn are called with it as an extra trailing argument."""
        return self._sample(variables, cond, reward_cond, key, aux_variables)

    # ------------------------------------------------------------------ #
    # shuffling (reference ``:731-749``)
    # ------------------------------------------------------------------ #

    def shuffle(self, samples: dict, cond, key: jax.Array):
        """Batch-perm samples+cond together; per-sample timestep perms."""
        b, _, t = samples["log_probs"].shape
        k1, k2 = jax.random.split(key)
        batch_perm = jax.random.permutation(k1, b)
        out = {k: v[batch_perm] for k, v in samples.items()}
        cond = jax.tree.map(lambda x: x[batch_perm], cond)
        # independent per-sample timestep permutation, shared across the pair
        step_perms = jax.vmap(lambda k: jax.random.permutation(k, t))(
            jax.random.split(k2, b)
        )  # (B, T)

        def perm_time(x, axis):
            idx = step_perms.reshape(
                (b,) + (1,) * (axis - 1) + (t,) + (1,) * (x.ndim - axis - 1)
            )
            return jnp.take_along_axis(x, idx, axis=axis)

        for k in ("latents", "next_latents", "input_latents"):
            out[k] = perm_time(out[k], 2)
        out["log_probs"] = perm_time(out["log_probs"], 2)
        for k in ("step_indices", "timesteps"):
            out[k] = perm_time(out[k], 1)
        return out, cond

    # ------------------------------------------------------------------ #
    # update phase
    # ------------------------------------------------------------------ #

    def _recompute_logprob(self, eps, step_indices, timesteps, x_t, x_prev):
        if self.config.sampler == "turbo":
            return turbo_logprob(self.schedule, eps, step_indices, x_t, x_prev)
        return distilled_logprob(
            self.alphas_cumprod, eps, timesteps, timesteps - self.step_ratio, x_t, x_prev
        )

    def _micro_loss(self, lora, params, micro, cond, key):
        """Loss for one (train_bs, one-timestep) microbatch.

        Fuses policy(traj0), policy(traj1), ref(traj0), ref(traj1) into a
        single 4b UNet apply with per-sample lora scales [1,1,0,0].
        """
        cfg = self.config
        bsz = micro["timesteps"].shape[0]
        # (b, 2, h, w, c) -> (2b, h, w, c): [traj0 | traj1]
        def flat(x):
            return x.swapaxes(0, 1).reshape((2 * bsz,) + x.shape[2:])

        inp = flat(micro["input_latents"])
        x_t = flat(micro["latents"])
        x_prev = flat(micro["next_latents"])
        t2 = jnp.tile(micro["timesteps"], 2)
        s2 = jnp.tile(micro["step_indices"], 2)

        if cfg.full_finetune:
            # trainable tree IS the param tree; ``params`` holds the frozen
            # reference copy (ref ``use_lora=False``: separate ref weights)
            variables = {"params": lora}
            ref_variables = {"params": params}
        else:
            variables = {"params": params, "lora": lora}
            ref_variables = None
        cond2 = jax.tree.map(lambda x: jnp.tile(x, (2,) + (1,) * (x.ndim - 1)), cond)
        if cfg.fuse_ref_pass:
            inp4 = jnp.concatenate([inp, inp], axis=0)
            t4 = jnp.tile(t2, 2)
            cond4 = jax.tree.map(
                lambda x: jnp.concatenate([x, x], axis=0), cond2
            )
            scale4 = jnp.concatenate(
                [jnp.ones((2 * bsz,), jnp.float32), jnp.zeros((2 * bsz,), jnp.float32)]
            )
            eps4 = self.unet_apply(variables, inp4, t4, cond4, scale4)
            eps_pol, eps_ref = jnp.split(eps4, 2, axis=0)
            eps_ref = jax.lax.stop_gradient(eps_ref)
        else:
            eps_pol = self.unet_apply(variables, inp, t2, cond2, 1.0)
            from ..ops import qconv

            # trace-time scope: inside it the UNet's weight matmuls and
            # resnet convs lower to dynamic int8 (grad-free pass only)
            ref_scope = (
                qconv.int8_ref_pass() if cfg.int8_ref_pass
                else contextlib.nullcontext()
            )
            with ref_scope:
                eps_ref = jax.lax.stop_gradient(
                    self.unet_apply(
                        jax.lax.stop_gradient(
                            ref_variables if cfg.full_finetune else variables
                        ),
                        inp, t2, cond2, 0.0,
                    )
                )

        x_t2 = jnp.concatenate([x_t, x_t], 0)
        x_prev2 = jnp.concatenate([x_prev, x_prev], 0)
        lp = self._recompute_logprob(
            jnp.concatenate([eps_pol, eps_ref], 0),
            jnp.concatenate([s2, s2], 0),
            jnp.concatenate([t2, t2], 0),
            x_t2,
            x_prev2,
        )
        lp_pol, lp_ref = jnp.split(lp, 2)
        lp_0, lp_1 = jnp.split(lp_pol, 2)
        ref_0, ref_1 = jnp.split(lp_ref, 2)

        if cfg.compare == "sample":
            prefer = sample_compare(
                micro["rewards"][:, 0], micro["rewards"][:, 1], key
            )
        else:
            prefer = pareto_compare(micro["rewards"][:, 0], micro["rewards"][:, 1])

        loss = pso_pairwise_loss(
            lp_0, ref_0, lp_1, ref_1, prefer, cfg.beta, cfg.eps,
            clamp_mode=cfg.clamp_mode,
        )
        ratio_w = jnp.mean(jnp.exp(jnp.where(prefer[:, 0] > 0, lp_0 - ref_0, lp_1 - ref_1)))
        return loss, {"loss": loss, "ratio_win": ratio_w}

    def _update_impl(self, state: PSOTrainState, params, batch, cond, key):
        """One optimizer update = scan over (grad_accum * T) microbatches.

        batch leaves: (grad_accum, train_bs, ...) sample slices; cond
        leaves: (grad_accum, train_bs, ...).
        """
        cfg = self.config
        t_steps = cfg.train_timesteps
        ga = cfg.grad_accum

        def micro(a, j, key):
            sl = jax.tree.map(lambda x: x[a], batch)
            c = jax.tree.map(lambda x: x[a], cond)
            m = {
                "input_latents": sl["input_latents"][:, :, j],
                "latents": sl["latents"][:, :, j],
                "next_latents": sl["next_latents"][:, :, j],
                "timesteps": sl["timesteps"][:, j],
                "step_indices": sl["step_indices"][:, j],
                "rewards": sl["rewards"],
            }
            return jax.grad(self._micro_loss, has_aux=True)(state.lora, params, m, c, key)

        def body(carry, scan_in):
            g_acc, m_acc = carry
            aj, k = scan_in
            a, j = aj // t_steps, aj % t_steps
            g, aux = micro(a, j, k)
            g_acc = jax.tree.map(jnp.add, g_acc, g)
            m_acc = jax.tree.map(jnp.add, m_acc, aux)
            return (g_acc, m_acc), None

        n_micro = ga * t_steps
        zeros_g = jax.tree.map(jnp.zeros_like, state.lora)
        zeros_m = {"loss": jnp.zeros(()), "ratio_win": jnp.zeros(())}
        keys = jax.random.split(key, n_micro)
        (g, m), _ = jax.lax.scan(
            body, (zeros_g, zeros_m), (jnp.arange(n_micro), keys)
        )
        g = jax.tree.map(lambda x: x / n_micro, g)
        m = jax.tree.map(lambda x: x / n_micro, m)
        new_state = state.apply_gradients(g, self.tx)
        from ..parallel.collectives import tree_global_norm

        m["grad_norm"] = tree_global_norm(g)
        return new_state, m

    def train_epoch(self, state, params, samples, cond, key):
        """Run all optimizer updates for one epoch of collected samples.

        samples leaves: (B_tot, ...); cond leaves: (B_tot, ...).
        Returns (state, list-of-metrics-dicts).
        """
        cfg = self.config
        b_tot = samples["log_probs"].shape[0]
        per_update = cfg.train_batch_size * cfg.grad_accum
        assert b_tot % per_update == 0, (b_tot, per_update)
        n_updates = b_tot // per_update
        metrics = []
        for ie in range(cfg.num_inner_epochs):
            k_shuf, k_ep = jax.random.split(jax.random.fold_in(key, ie))
            shuffled, cond_sh = self.shuffle(samples, cond, k_shuf)

            def slice_update(tree, u):
                sliced = jax.tree.map(
                    lambda x: x[u * per_update : (u + 1) * per_update].reshape(
                        (cfg.grad_accum, cfg.train_batch_size) + x.shape[1:]
                    ),
                    tree,
                )
                if self.mesh is not None:
                    # axis 0 is grad-accum (scanned), axis 1 the device batch
                    from ..parallel.mesh import shard_global_batch

                    sliced = shard_global_batch(self.mesh, sliced, axis=1)
                return sliced

            for u in range(n_updates):
                state, m = self._update(
                    state,
                    params,
                    slice_update(shuffled, u),
                    slice_update(cond_sh, u),
                    jax.random.fold_in(k_ep, u),
                )
                metrics.append(jax.tree.map(float, m))
        return state, metrics

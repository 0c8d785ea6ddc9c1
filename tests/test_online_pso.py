"""End-to-end online PSO loop on a tiny UNet (CPU).

The strongest correctness anchor: on the very first optimizer update the
policy and reference model coincide (LoRA b=0), so every recomputed
probability ratio is exactly 1 and the DPO loss must equal log(2). Any
mismatch between the sampling-time transitions and the train-time logprob
recompute (scaling, indexing, shuffling) breaks this identity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
from pairwise_sample_optimization_tpu.train import (
    OnlinePSOConfig,
    OnlinePSOTrainer,
    PSOTrainState,
    make_optimizer,
)

B = 4  # sampled prompts per epoch


def _make(sampler="turbo", compare="sample"):
    ucfg = UNetConfig.tiny(lora_rank=2)
    model = SDXLUNet(ucfg)

    def unet_apply(variables, x, t, cond, lora_scale):
        return model.apply(
            variables,
            x,
            t,
            cond["embeds"],
            cond["pooled"],
            cond["time_ids"],
            lora_scale=lora_scale,
        )

    def decode_fn(z):
        return jnp.tanh(z[..., :3])

    def reward_fn(images, rc):
        del rc
        return jnp.mean(images, axis=(1, 2, 3))

    cfg = OnlinePSOConfig(
        sampler=sampler,
        num_steps=4,
        train_batch_size=2,
        grad_accum=2,
        compare=compare,
        beta=50.0,
        eps=0.1,
    )
    tx = make_optimizer(learning_rate=1e-3)
    trainer = OnlinePSOTrainer(
        cfg, unet_apply, tx, decode_fn=decode_fn, reward_fn=reward_fn, latent_hw=8
    )

    cond = {
        "embeds": jax.random.normal(jax.random.key(1), (B, 5, ucfg.cross_attention_dim)),
        "pooled": jax.random.normal(jax.random.key(2), (B, ucfg.pooled_embed_dim)),
        "time_ids": jnp.tile(jnp.array([[512, 512, 0, 0, 512, 512]]), (B, 1)),
    }
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)),
        cond["embeds"][:1],
        cond["pooled"][:1],
        cond["time_ids"][:1],
    )
    return trainer, variables, cond


@pytest.mark.parametrize("sampler,compare", [("turbo", "sample"), ("dmd", "pareto")])
def test_full_epoch(sampler, compare):
    trainer, variables, cond = _make(sampler, compare)
    samples, images = trainer.sample_pairs(variables, cond, {}, jax.random.key(10))

    assert samples["latents"].shape == (B, 2, 3, 8, 8, 4)
    assert samples["next_latents"].shape == (B, 2, 3, 8, 8, 4)
    assert samples["log_probs"].shape == (B, 2, 3)
    assert samples["rewards"].shape == (B, 2, 1)
    assert images.shape == (2 * B, 8, 8, 3)
    assert np.isfinite(np.asarray(samples["log_probs"])).all()
    # the two trajectories must differ (independent noise)
    assert (
        np.abs(np.asarray(samples["latents"][:, 0]) - np.asarray(samples["latents"][:, 1])).max()
        > 1e-3
    )

    state = PSOTrainState.create(variables["lora"], trainer.tx)
    lora_before = jax.tree.map(np.asarray, state.lora)
    state, metrics = trainer.train_epoch(
        state, variables["params"], samples, cond, jax.random.key(11)
    )

    assert len(metrics) == 1  # B_tot / (train_bs * grad_accum) = 4/4 updates
    losses = [m["loss"] for m in metrics]
    assert all(np.isfinite(l) for l in losses)

    # first update: policy == reference -> every ratio 1 -> loss == log 2
    np.testing.assert_allclose(losses[0], np.log(2.0), rtol=1e-4)

    # lora must have moved (b leaves nonzero after update)
    moved = [
        np.abs(a - np.asarray(b)).max()
        for a, b in zip(jax.tree.leaves(lora_before), jax.tree.leaves(state.lora))
    ]
    assert max(moved) > 0
    assert int(state.step) == len(metrics)


def test_unfused_ref_pass_matches():
    """fuse_ref_pass=False (memory mode) must produce the same loss."""
    import dataclasses

    trainer, variables, cond = _make()
    samples, _ = trainer.sample_pairs(variables, cond, {}, jax.random.key(40))
    state = PSOTrainState.create(variables["lora"], trainer.tx)

    from pairwise_sample_optimization_tpu.train.online_pso import OnlinePSOTrainer

    trainer2 = OnlinePSOTrainer(
        dataclasses.replace(trainer.config, fuse_ref_pass=False),
        trainer.unet_apply,
        trainer.tx,
        latent_hw=8,
    )
    # fresh buffers: _update donates the state, which would delete the
    # lora arrays shared with `state`
    state2 = PSOTrainState.create(
        jax.tree.map(jnp.array, variables["lora"]), trainer2.tx
    )
    _, m1 = trainer.train_epoch(state, variables["params"], samples, cond, jax.random.key(41))
    _, m2 = trainer2.train_epoch(state2, variables["params"], samples, cond, jax.random.key(41))
    np.testing.assert_allclose(m1[0]["loss"], m2[0]["loss"], rtol=1e-4)
    np.testing.assert_allclose(m2[0]["loss"], np.log(2.0), rtol=1e-4)


def test_second_epoch_off_policy():
    trainer, variables, cond = _make()
    samples, _ = trainer.sample_pairs(variables, cond, {}, jax.random.key(20))
    state = PSOTrainState.create(variables["lora"], trainer.tx)
    state, m1 = trainer.train_epoch(state, variables["params"], samples, cond, jax.random.key(21))
    # re-train on the SAME samples with the moved lora: ratios != 1 now
    state, m2 = trainer.train_epoch(state, variables["params"], samples, cond, jax.random.key(22))
    assert abs(m2[0]["loss"] - np.log(2.0)) > 1e-5


def test_inner_epochs_and_multiple_updates():
    """2 sampled batches + 2 inner epochs: 4 updates total; the first sits
    at log(2), later ones move off-policy as the LoRA updates."""
    import dataclasses

    trainer, variables, cond = _make()
    trainer.config = dataclasses.replace(trainer.config, num_inner_epochs=2)
    s1, _ = trainer.sample_pairs(variables, cond, {}, jax.random.key(50))
    s2, _ = trainer.sample_pairs(variables, cond, {}, jax.random.key(51))
    samples = jax.tree.map(lambda a, b: jnp.concatenate([a, b], 0), s1, s2)
    cond2 = jax.tree.map(lambda a: jnp.concatenate([a, a], 0), cond)

    state = PSOTrainState.create(variables["lora"], trainer.tx)
    state, metrics = trainer.train_epoch(
        state, variables["params"], samples, cond2, jax.random.key(52)
    )
    # 8 samples / (bs2 * ga2) = 2 updates per inner epoch x 2 inner epochs
    assert len(metrics) == 4
    assert int(state.step) == 4
    np.testing.assert_allclose(metrics[0]["loss"], np.log(2.0), rtol=1e-4)
    assert abs(metrics[-1]["loss"] - np.log(2.0)) > 1e-6


def test_full_finetune_epoch():
    """use_lora=False path: the trainable tree is the full param tree and
    the reference is a frozen copy (reference ``config_sdxl_turbo_dpo.py:36-38``).
    The on-policy loss == log(2) identity must hold here too (policy and
    frozen copy coincide on the first update)."""
    import dataclasses

    ucfg = UNetConfig.tiny(lora_rank=0)
    model = SDXLUNet(ucfg)

    def unet_apply(variables, x, t, cond, lora_scale):
        return model.apply(
            variables, x, t, cond["embeds"], cond["pooled"], cond["time_ids"],
            lora_scale=lora_scale,
        )

    cfg = OnlinePSOConfig(
        sampler="turbo", num_steps=4, train_batch_size=2, grad_accum=2,
        full_finetune=True, fuse_ref_pass=False,
    )
    tx = make_optimizer(learning_rate=1e-3)
    trainer = OnlinePSOTrainer(
        cfg, unet_apply, tx,
        decode_fn=lambda z: jnp.tanh(z[..., :3]),
        reward_fn=lambda images, rc: jnp.mean(images, axis=(1, 2, 3)),
        latent_hw=8,
    )
    cond = {
        "embeds": jax.random.normal(jax.random.key(1), (B, 5, ucfg.cross_attention_dim)),
        "pooled": jax.random.normal(jax.random.key(2), (B, ucfg.pooled_embed_dim)),
        "time_ids": jnp.tile(jnp.array([[512, 512, 0, 0, 512, 512]]), (B, 1)),
    }
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        cond["embeds"][:1], cond["pooled"][:1], cond["time_ids"][:1],
    )
    samples, _ = trainer.sample_pairs({"params": variables["params"]}, cond, {}, jax.random.key(10))
    # trainable starts as a fresh copy of params; ref = original params
    state = PSOTrainState.create(jax.tree.map(jnp.array, variables["params"]), tx)
    before = jax.tree.map(np.asarray, state.lora)
    state, metrics = trainer.train_epoch(
        state, variables["params"], samples, cond, jax.random.key(11)
    )
    np.testing.assert_allclose(metrics[0]["loss"], np.log(2.0), rtol=1e-4)
    moved = [
        np.abs(a - np.asarray(b)).max()
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.lora))
    ]
    assert max(moved) > 0  # full params updated

    # config guard: fused ref pass cannot express full finetune
    with pytest.raises(ValueError):
        dataclasses.replace(cfg, fuse_ref_pass=True)


def test_sample_pairs_aux_variables():
    """decode/reward weights threaded as jit arguments (not baked)."""
    trainer, variables, cond = _make()
    s0, images0 = trainer.sample_pairs(variables, cond, {}, jax.random.key(7))
    # aux!=None retraces with the aux-aware fns (distinct pytree structure)
    trainer.decode_fn = lambda z, aux: jnp.tanh(z[..., :3]) * aux["gain"]
    trainer.reward_fn = lambda images, rc, aux: jnp.mean(images, axis=(1, 2, 3)) + aux["bias"]
    aux = {"gain": jnp.asarray(2.0), "bias": jnp.asarray(1.0)}
    s, images = trainer.sample_pairs(variables, cond, {}, jax.random.key(7), aux_variables=aux)
    np.testing.assert_allclose(
        np.asarray(images), 2.0 * np.asarray(images0), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s["rewards"]), 2.0 * np.asarray(s0["rewards"]) + 1.0,
        rtol=1e-5, atol=1e-5,
    )


def test_dmd_pair_shared_noise_per_trajectory():
    """Reference parity for the DMD shared-noise quirk at PAIR level: each
    trajectory is a separate pipeline call in the reference, so the
    batch-shared (1,C,H,W) re-noise draw must be shared WITHIN a
    trajectory's batch but DIFFER between the pair's two trajectories
    (``distilled_inference_with_logprob.py:121-126``)."""
    from pairwise_sample_optimization_tpu.ops.ddpm_renoise import _prev_mean_std
    from pairwise_sample_optimization_tpu.ops.schedules import make_alphas_cumprod

    cfg = OnlinePSOConfig(sampler="dmd", num_steps=3, train_batch_size=2)
    trainer = OnlinePSOTrainer(
        cfg,
        lambda v, x, t, cond, s: jnp.zeros_like(x),  # eps = 0: mean is closed-form
        make_optimizer(),
        latent_hw=4,
    )
    cond = {"embeds": jnp.zeros((2, 1, 8))}
    samples, _ = trainer.sample_pairs({}, cond, None, jax.random.key(3))

    acp = make_alphas_cumprod()
    ratio = 1000 // cfg.num_steps
    noise = np.zeros((2, 2, cfg.num_steps - 1, 4, 4, 4), np.float32)
    for b in range(2):
        for traj in range(2):
            for j in range(cfg.num_steps - 1):
                t = samples["timesteps"][b, j][None]
                x = samples["latents"][b, traj, j][None]
                mean, std = _prev_mean_std(
                    acp, jnp.zeros_like(x), t, t - ratio, x
                )
                noise[b, traj, j] = np.asarray(
                    (samples["next_latents"][b, traj, j] - mean[0]) / std[0]
                )
    # shared within each trajectory's batch...
    np.testing.assert_allclose(noise[0], noise[1], atol=1e-5)
    # ...but distinct between the two trajectories of the pair
    assert np.abs(noise[:, 0] - noise[:, 1]).max() > 0.1


def test_shuffle_preserves_transition_alignment():
    """After shuffling, (latents[j], next_latents[j], step_indices[j]) must
    still be a consistent transition triple — verified via the log-prob
    identity on the shuffled tensors."""
    trainer, variables, cond = _make()
    samples, _ = trainer.sample_pairs(variables, cond, {}, jax.random.key(30))
    shuffled, cond_sh = trainer.shuffle(samples, cond, jax.random.key(31))

    from pairwise_sample_optimization_tpu.ops.euler_ancestral import turbo_logprob

    def unet_eps(x_in, t, c):
        return SDXLUNet(UNetConfig.tiny(lora_rank=2)).apply(
            variables, x_in, t, c["embeds"], c["pooled"], c["time_ids"], lora_scale=1.0
        )

    for j in range(3):
        for traj in range(2):
            eps = unet_eps(
                shuffled["input_latents"][:, traj, j],
                shuffled["timesteps"][:, j],
                cond_sh,
            )
            lp = turbo_logprob(
                trainer.schedule,
                eps,
                shuffled["step_indices"][:, j],
                shuffled["latents"][:, traj, j],
                shuffled["next_latents"][:, traj, j],
            )
            # rtol covers fp32 reduction-order noise (test recomputes with
            # batch B where sampling ran 2B); misalignment would be off by
            # orders of magnitude
            np.testing.assert_allclose(
                np.asarray(lp),
                np.asarray(shuffled["log_probs"][:, traj, j]),
                rtol=2e-3,
                atol=2e-3,
            )

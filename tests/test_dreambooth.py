"""DreamBooth/offline PSO trainer tests (tiny UNet, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
from pairwise_sample_optimization_tpu.train import PSOTrainState, make_optimizer
from pairwise_sample_optimization_tpu.train.dreambooth_pso import (
    DreamBoothPSOConfig,
    DreamBoothPSOTrainer,
    make_sigma_table,
    sample_lattice_timesteps,
)

B = 2


def _make(loss_type="pso_db", prior=0.5, **cfg_kwargs):
    ucfg = UNetConfig.tiny(lora_rank=2)
    model = SDXLUNet(ucfg)

    def unet_apply(variables, x, t, cond, lora_scale):
        return model.apply(
            variables, x, t, cond["embeds"], cond["pooled"], cond["time_ids"],
            lora_scale=lora_scale,
        )

    cond = {
        "embeds": jax.random.normal(jax.random.key(1), (B, 5, ucfg.cross_attention_dim)),
        "pooled": jax.random.normal(jax.random.key(2), (B, ucfg.pooled_embed_dim)),
        "time_ids": jnp.tile(jnp.array([[512.0, 512, 0, 0, 512, 512]]), (B, 1)),
    }
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)),
        cond["embeds"][:1],
        cond["pooled"][:1],
        cond["time_ids"][:1],
    )
    cfg = DreamBoothPSOConfig(
        loss_type=loss_type, beta=5.0, prior_loss_weight=prior, **cfg_kwargs
    )
    trainer = DreamBoothPSOTrainer(cfg, unet_apply, make_optimizer(learning_rate=1e-3))
    batch = {
        "instance_latents": jax.random.normal(jax.random.key(3), (B, 8, 8, 4)),
        "negative_latents": jax.random.normal(jax.random.key(4), (B, 8, 8, 4)),
        "cond": cond,
    }
    return trainer, variables, batch


def test_per_half_time_ids_reach_the_unet():
    """SDXL micro-conditioning: per-image time_ids in the batch must
    change the UNet conditioning (win half = dataset records, lose half
    = generator defaults) — and be a no-op when they equal the cond's."""
    trainer, variables, batch = _make()
    base_tid = batch["cond"]["time_ids"]

    def loss_of(b):
        # fresh state + fresh leaf copies per call: update() donates its
        # state argument (including the lora leaves it references)
        lora = jax.tree.map(jnp.array, variables["lora"])
        state = PSOTrainState.create(lora, trainer.tx)
        _, aux = trainer.update(state, variables["params"], b, jax.random.key(7))
        return float(aux["loss"])

    same = loss_of({**batch, "time_ids_win": base_tid, "time_ids_lose": base_tid})
    np.testing.assert_allclose(same, loss_of(batch), rtol=1e-6)
    shifted = jnp.tile(jnp.array([[1024.0, 768, 37, 91, 512, 512]]), (B, 1))
    different = loss_of(
        {**batch, "time_ids_win": shifted, "time_ids_lose": base_tid}
    )
    assert abs(different - same) > 1e-6


def test_time_ids_from_records():
    from pairwise_sample_optimization_tpu.models.sdxl_text import (
        time_ids_from_records,
    )

    rows = time_ids_from_records([(768, 1024), (512, 512)], [(10, 20), (0, 0)], 512)
    np.testing.assert_array_equal(
        np.asarray(rows),
        np.array(
            [[768, 1024, 10, 20, 512, 512], [512, 512, 0, 0, 512, 512]],
            np.float32,
        ),
    )


def test_sigma_table():
    sig = make_sigma_table()
    assert sig.shape == (1000,)
    assert float(sig[0]) < float(sig[-1])  # sigma grows with t
    # sigma at t=999 ~ 14.6 (SDXL convention)
    np.testing.assert_allclose(float(sig[999]), 14.6146, rtol=1e-3)


def test_lattice_timesteps():
    t = sample_lattice_timesteps(jax.random.key(0), 512, 1000, 4)
    allowed = {249, 499, 749, 999}
    assert set(np.asarray(t).tolist()) == allowed


@pytest.mark.parametrize("loss_type", ["pso_db", "pso"])
def test_update_moves_lora(loss_type):
    trainer, variables, batch = _make(loss_type)
    state = PSOTrainState.create(variables["lora"], trainer.tx)
    before = jax.tree.map(np.asarray, state.lora)
    state, aux = trainer.update(state, variables["params"], batch, jax.random.key(7))
    assert np.isfinite(float(aux["loss"]))
    assert 0.0 <= float(aux["implicit_acc"]) <= 1.0
    moved = max(
        np.abs(a - np.asarray(b)).max()
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.lora))
    )
    assert moved > 0
    assert int(state.step) == 1


def test_mesh_update_matches_single_device():
    """trainer.update with a data-parallel mesh must shard the batch over
    ``data`` and reproduce the unmeshed update numerically (the reference
    DreamBooth's accelerate-DDP equivalence)."""
    from jax.sharding import PartitionSpec as P

    from pairwise_sample_optimization_tpu.parallel.mesh import (
        MeshSpec,
        make_mesh,
        replicate,
    )

    n = len(jax.devices())
    if n < 2:
        pytest.skip("needs multiple devices")
    trainer, variables, batch = _make()
    # batch divisible by the data axis so the shard actually distributes
    big = jax.tree.map(lambda x: jnp.concatenate([x] * (-(-n // B)), 0)[:n], batch)
    # fresh buffer copies per run: _update donates the state, whose lora
    # leaves otherwise alias variables["lora"]
    fresh = lambda: jax.tree.map(jnp.array, variables["lora"])
    state0 = PSOTrainState.create(fresh(), trainer.tx)
    s_ref, aux_ref = trainer.update(
        state0, variables["params"], big, jax.random.key(7)
    )

    mesh = make_mesh(MeshSpec(data=n))
    trainer.mesh = mesh
    from pairwise_sample_optimization_tpu.parallel.mesh import shard_global_batch

    placed = shard_global_batch(mesh, big, axis=0)
    assert placed["instance_latents"].sharding.spec == P("data")
    state0 = replicate(mesh, PSOTrainState.create(fresh(), trainer.tx))
    params = replicate(mesh, variables["params"])
    s_mesh, aux_mesh = trainer.update(state0, params, big, jax.random.key(7))
    np.testing.assert_allclose(
        float(aux_mesh["loss"]), float(aux_ref["loss"]), rtol=1e-5
    )
    for a, b_ in zip(jax.tree.leaves(s_ref.lora), jax.tree.leaves(s_mesh.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)


def test_pso_first_step_logits_zero():
    """With LoRA b=0, policy == reference -> ref_diff == model_diff ->
    logits 0 -> loss = log(2) + prior term."""
    trainer, variables, batch = _make("pso", prior=0.0)
    state = PSOTrainState.create(variables["lora"], trainer.tx)
    _, aux = trainer.update(state, variables["params"], batch, jax.random.key(9))
    np.testing.assert_allclose(float(aux["loss"]), np.log(2.0), rtol=1e-4)


def test_descending_table_indexing():
    """Reference parity (``:1782``): lattice values index the DESCENDING
    timestep table, so effective trained timesteps are {0,250,500,750}."""
    from pairwise_sample_optimization_tpu.train.dreambooth_pso import (
        sample_lattice_timesteps,
    )

    idx = sample_lattice_timesteps(jax.random.key(0), 256, 1000, 4)
    t_eff = 999 - np.asarray(idx)
    assert set(t_eff.tolist()) == {0, 250, 500, 750}


def test_edm_preconditioning_numerics():
    """EDM branch formulas (ref :1794,1851): c_in/c_skip/c_out identities
    with sigma_data, plus the Karras table endpoints."""
    from pairwise_sample_optimization_tpu.ops.schedules import make_karras_sigmas

    trainer, variables, batch = _make("pso_db", scheduler_space="edm")
    sig_table = make_karras_sigmas(1000)
    np.testing.assert_allclose(float(sig_table[0]), 0.002, rtol=1e-5)
    np.testing.assert_allclose(float(sig_table[-1]), 80.0, rtol=1e-5)

    lat = batch["instance_latents"]
    noise = jnp.ones_like(lat)
    t = jnp.array([100, 900])
    inp, tc, noisy, target, w, post = trainer._noise_and_precondition(lat, noise, t)
    sig = np.asarray(sig_table)[np.asarray(t)].reshape(-1, 1, 1, 1)
    sd = 0.5
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(lat) + sig, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(inp), np.asarray(noisy) / np.sqrt(sig**2 + sd**2), rtol=1e-5
    )
    # c_noise conditioning = 0.25 ln(sigma)
    np.testing.assert_allclose(np.asarray(tc), 0.25 * np.log(sig[:, 0, 0, 0]), rtol=1e-5)
    # x0 reconstruction: if pred = (x_t - c_skip*x_t...) closed identity:
    # post(pred) == c_skip*noisy + c_out*pred
    pred = jnp.full_like(lat, 2.0)
    c_skip = sd**2 / (sig**2 + sd**2)
    c_out = sig * sd / np.sqrt(sig**2 + sd**2)
    np.testing.assert_allclose(
        np.asarray(post(pred, noisy)),
        c_skip * np.asarray(noisy) + c_out * 2.0,
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(w), 1.0)
    np.testing.assert_allclose(np.asarray(target), np.asarray(lat))


def test_ddpm_branch_targets_noise():
    """DDPM branch (ref :1240, no edm-style): VP noising, raw eps target."""
    trainer, variables, batch = _make("pso_db", scheduler_space="ddpm")
    lat = batch["instance_latents"]
    noise = jax.random.normal(jax.random.key(5), lat.shape)
    t = jnp.array([10, 990])
    inp, tc, noisy, target, w, post = trainer._noise_and_precondition(lat, noise, t)
    abar = np.asarray(trainer.alphas_cumprod)[np.asarray(t)].reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(
        np.asarray(noisy),
        np.sqrt(abar) * np.asarray(lat) + np.sqrt(1 - abar) * np.asarray(noise),
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(inp), np.asarray(noisy))  # no precondition
    np.testing.assert_allclose(np.asarray(target), np.asarray(noise))
    np.testing.assert_allclose(np.asarray(w), 1.0)
    # identity postcondition: a perfect eps prediction has zero loss
    per = trainer._weighted_mse(post(noise, noisy), target, w)
    np.testing.assert_allclose(np.asarray(per), 0.0, atol=1e-6)


def test_v_prediction_euler_edm_consistency():
    """v-pred postcondition (ref :1855-1857) recovers x0 from the true v."""
    trainer, variables, batch = _make(
        "pso_db", scheduler_space="euler_edm", prediction_type="v_prediction"
    )
    lat = batch["instance_latents"].astype(jnp.float32)
    noise = jax.random.normal(jax.random.key(6), lat.shape)
    t = jnp.array([400, 800])
    inp, tc, noisy, target, w, post = trainer._noise_and_precondition(lat, noise, t)
    sig = np.asarray(trainer.sigmas)[np.asarray(t)].reshape(-1, 1, 1, 1)
    # In sigma space x_t = x0 + sigma*n; the Euler v-pred that recovers x0
    # satisfies x0 = v*(-sigma/sqrt(sigma^2+1)) + x_t/(sigma^2+1)
    # => v = (x_t/(sigma^2+1) - x0) * sqrt(sigma^2+1)/sigma
    v = (np.asarray(noisy) / (sig**2 + 1) - np.asarray(lat)) * np.sqrt(
        sig**2 + 1
    ) / sig
    np.testing.assert_allclose(
        np.asarray(post(jnp.asarray(v), noisy)), np.asarray(lat), rtol=2e-4, atol=1e-5
    )


def test_grad_accum_matches_manual_average():
    """ga=2 update == one optimizer step on the mean of the micro-grads."""
    trainer, variables, batch = _make("pso_db", prior=0.0, grad_accum=2)
    state = PSOTrainState.create(variables["lora"], trainer.tx)
    mb = jax.tree.map(lambda x: jnp.stack([x, x * 0.5]), batch)
    key = jax.random.key(11)

    # manual reference FIRST: trainer.update donates the state buffers
    keys = jax.random.split(key, 2)
    gsum, auxes = None, []
    for i in range(2):
        mbi = jax.tree.map(lambda x: x[i], mb)
        g, a = jax.grad(trainer._microbatch_loss, has_aux=True)(
            state.lora, variables["params"], mbi, keys[i]
        )
        gsum = g if gsum is None else jax.tree.map(jnp.add, gsum, g)
        auxes.append(a)
    gavg = jax.tree.map(lambda x: x / 2.0, gsum)
    manual = state.apply_gradients(gavg, trainer.tx)
    manual = jax.tree.map(np.asarray, manual)

    new_state, aux = trainer.update(state, variables["params"], mb, key)
    for got, want in zip(jax.tree.leaves(new_state.lora), jax.tree.leaves(manual.lora)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(
        float(aux["loss"]),
        np.mean([float(a["loss"]) for a in auxes]),
        rtol=1e-5,
    )


def test_train_text_encoder_moves_te_lora():
    """TE-LoRA training: trainable tree {'unet','te1','te2'}; the TE 'b'
    adapters receive gradient through the re-encoded prompts; first-step
    pso loss still log(2) (all adapters start as no-ops)."""
    import dataclasses as dc

    from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
    from pairwise_sample_optimization_tpu.models.clip import CLIPTextConfig, CLIPTextTower
    from pairwise_sample_optimization_tpu.models.sdxl_text import compute_time_ids

    ucfg = UNetConfig.tiny(lora_rank=2)
    model = SDXLUNet(ucfg)
    t1 = CLIPTextTower(dc.replace(CLIPTextConfig.tiny(), width=16, heads=2, lora_rank=2))
    t2 = CLIPTextTower(
        dc.replace(CLIPTextConfig.tiny(), width=16, heads=2, projection_dim=16, lora_rank=2)
    )
    ids = jnp.ones((B, 8), jnp.int32).at[:, 4].set(40)
    t1v = t1.init(jax.random.key(1), ids)
    t2v = t2.init(jax.random.key(2), ids)

    def unet_apply(variables, x, t, cond, lora_scale):
        return model.apply(
            variables, x, t, cond["embeds"], cond["pooled"], cond["time_ids"],
            lora_scale=lora_scale,
        )

    def encode_prompt(te_params, te_loras, ids1, ids2):
        o1 = t1.apply({"params": te_params["te1"], "lora": te_loras["te1"]}, ids1)
        o2 = t2.apply({"params": te_params["te2"], "lora": te_loras["te2"]}, ids2)
        return {
            "embeds": jnp.concatenate([o1["penultimate"], o2["penultimate"]], -1),
            "pooled": o2["projected"],
            "time_ids": compute_time_ids(ids1.shape[0], 64),
        }

    cond_probe = encode_prompt(
        {"te1": t1v["params"], "te2": t2v["params"]},
        {"te1": t1v["lora"], "te2": t2v["lora"]},
        ids, ids,
    )
    uvars = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        cond_probe["embeds"][:1], cond_probe["pooled"][:1], cond_probe["time_ids"][:1],
    )
    cfg = DreamBoothPSOConfig(
        loss_type="pso", prior_loss_weight=0.0, train_text_encoder=True
    )
    trainer = DreamBoothPSOTrainer(
        cfg, unet_apply, make_optimizer(learning_rate=1e-3), encode_prompt=encode_prompt
    )
    lora0 = {"unet": uvars["lora"], "te1": t1v["lora"], "te2": t2v["lora"]}
    params = {"unet": uvars["params"], "te1": t1v["params"], "te2": t2v["params"]}
    state = PSOTrainState.create(lora0, trainer.tx)
    batch = {
        "instance_latents": jax.random.normal(jax.random.key(3), (B, 8, 8, 4)),
        "negative_latents": jax.random.normal(jax.random.key(4), (B, 8, 8, 4)),
        "input_ids_one": ids,
        "input_ids_two": ids,
    }
    new_state, aux = trainer.update(state, params, batch, jax.random.key(7))
    np.testing.assert_allclose(float(aux["loss"]), np.log(2.0), rtol=1e-4)
    # TE adapter 'b' leaves must move (grad flows through re-encoding)
    moved = 0.0
    for coll in ("te1", "te2"):
        for path, leaf in jax.tree_util.tree_flatten_with_path(new_state.lora[coll])[0]:
            if path[-1].key == "b":
                moved = max(moved, float(jnp.abs(leaf).max()))
    assert moved > 0.0


def test_joint_lora_export_roundtrip():
    """Joint unet+TE export writes all three diffusers prefixes and
    round-trips the TE trees."""
    import dataclasses as dc

    from pairwise_sample_optimization_tpu.checkpoints import (
        clip_text_param_map,
        export_sdxl_lora_safetensors,
        import_lora_safetensors,
    )
    from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
    from pairwise_sample_optimization_tpu.models.clip import CLIPTextConfig, CLIPTextTower

    ucfg = UNetConfig.tiny(lora_rank=2)
    model = SDXLUNet(ucfg)
    uvars = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 5, ucfg.cross_attention_dim)),
        jnp.zeros((1, ucfg.pooled_embed_dim)), jnp.zeros((1, 6)),
    )
    t1 = CLIPTextTower(dc.replace(CLIPTextConfig.tiny(), lora_rank=2))
    t1v = t1.init(jax.random.key(1), jnp.ones((1, 8), jnp.int32))
    # fill lora with distinct values so the roundtrip is meaningful
    lora_te = jax.tree.map(
        lambda x: jnp.arange(x.size, dtype=x.dtype).reshape(x.shape) / 100.0,
        t1v["lora"],
    )
    sd = export_sdxl_lora_safetensors(
        {"unet": uvars["lora"], "te1": lora_te}
    )
    assert any(k.startswith("unet.") for k in sd)
    assert any(k.startswith("text_encoder.") for k in sd)
    assert not any(k.startswith("text_encoder_2.") for k in sd)
    back = import_lora_safetensors(
        sd, lora_te, prefix="text_encoder.", site_map=clip_text_param_map
    )
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(lora_te)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_dreambooth_dataset(tmp_path):
    from PIL import Image

    from pairwise_sample_optimization_tpu.data.dreambooth import (
        DreamBoothDataset,
        NegativePool,
    )

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i, size in enumerate([(80, 60), (64, 100), (128, 128)]):
        Image.fromarray(
            rng.integers(0, 255, size + (3,), dtype=np.uint8)
        ).save(d / f"{i}.png")

    ds = DreamBoothDataset(str(d), "a photo of sks dog", resolution=32)
    assert len(ds) == 3
    item = ds[0]
    assert item["pixel_values"].shape == (32, 32, 3)
    assert item["pixel_values"].min() >= -1.0 and item["pixel_values"].max() <= 1.0
    assert item["original_size"] == (80, 60)

    batch = next(ds.batches(2))
    assert batch["pixel_values"].shape == (2, 32, 32, 3)
    assert len(batch["prompts"]) == 2

    pool = NegativePool(rng.uniform(-1, 1, (5, 32, 32, 3)).astype(np.float32))
    neg = pool.sample(2)
    assert neg.shape == (2, 32, 32, 3)

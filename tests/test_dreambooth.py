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


def _make(loss_type="pso_db", prior=0.5):
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
        loss_type=loss_type, beta=5.0, prior_loss_weight=prior
    )
    trainer = DreamBoothPSOTrainer(cfg, unet_apply, make_optimizer(learning_rate=1e-3))
    batch = {
        "instance_latents": jax.random.normal(jax.random.key(3), (B, 8, 8, 4)),
        "negative_latents": jax.random.normal(jax.random.key(4), (B, 8, 8, 4)),
        "cond": cond,
    }
    return trainer, variables, batch


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


def test_pso_first_step_logits_zero():
    """With LoRA b=0, policy == reference -> ref_diff == model_diff ->
    logits 0 -> loss = log(2) + prior term."""
    trainer, variables, batch = _make("pso", prior=0.0)
    state = PSOTrainState.create(variables["lora"], trainer.tx)
    _, aux = trainer.update(state, variables["params"], batch, jax.random.key(9))
    np.testing.assert_allclose(float(aux["loss"]), np.log(2.0), rtol=1e-4)


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

"""Prodigy optimizer, DoRA adapters, LR schedules, kohya export — the
DreamBooth trainer's optimizer/adapter option surface (reference
``train_pso_sdxl_turbo_dreambooth.py:620-668,741-746,1321,1479-1565,
1614-1622``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax


# ------------------------------------------------------------------ #
# Prodigy
# ------------------------------------------------------------------ #


def test_prodigy_adapts_d_and_converges():
    """On a far-from-optimum quadratic with lr=1.0 (the parameter-free
    setting), the distance estimate d must grow orders of magnitude above
    d0 and the iterate must approach the optimum."""
    from pairwise_sample_optimization_tpu.train.prodigy import prodigy

    target = jnp.full((8,), 10.0)
    params = {"x": jnp.zeros((8,))}
    tx = prodigy(learning_rate=1.0, d0=1e-6)
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: 0.5 * jnp.sum((p["x"] - target) ** 2))(params)
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(300):
        params, state = step(params, state)
    dist = float(jnp.linalg.norm(params["x"] - target))
    assert float(state.d) > 1e-3, float(state.d)  # grew >> d0
    assert dist < 1.0, dist  # started at 10*sqrt(8) ~ 28


def test_prodigy_knobs_run_and_decay_decouples():
    from pairwise_sample_optimization_tpu.train.prodigy import prodigy

    params = {"w": jnp.ones((4, 4))}
    grads = {"w": jnp.ones((4, 4)) * 0.1}
    for kwargs in (
        dict(use_bias_correction=True),
        dict(safeguard_warmup=True),
        dict(weight_decay=0.1, decouple=True),
        dict(beta3=0.9),
    ):
        tx = prodigy(**kwargs)
        st = tx.init(params)
        up, st = tx.update(grads, st, params)
        assert jnp.all(jnp.isfinite(up["w"]))
        up2, _ = tx.update(grads, st, params)
        assert jnp.all(jnp.isfinite(up2["w"]))


def test_prodigy_coupled_weight_decay_is_l2_on_grads():
    """decouple=False folds wd*p into the gradient BEFORE the moment
    updates (prodigyopt semantics) — it must not be silently dropped."""
    from pairwise_sample_optimization_tpu.train.prodigy import prodigy

    # asymmetric params: wd*p then changes the gradient DIRECTION (a pure
    # rescale would cancel in prodigy's scale-invariant first steps)
    params = {"w": jnp.asarray([2.0, -2.0, 0.5, -0.5])}
    grads = {"w": jnp.ones((4,)) * 0.1}
    wd = 0.5
    tx_l2 = prodigy(weight_decay=wd, decouple=False)
    tx_pre = prodigy(weight_decay=0.0)
    pre_grads = {"w": grads["w"] + wd * params["w"]}

    def two_steps(tx, g):
        st = tx.init(params)
        up1, st = tx.update(g, st, params)
        p1 = {"w": params["w"] + up1["w"]}
        up2, _ = tx.update(g, st, p1)
        return up1["w"], up2["w"]

    l2_1, l2_2 = two_steps(tx_l2, grads)
    # manually pre-adding wd*p with wd=0 inside must match exactly
    pre_1, pre_2 = two_steps(tx_pre, pre_grads)
    np.testing.assert_allclose(np.asarray(l2_1), np.asarray(pre_1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(l2_2), np.asarray(pre_2), rtol=1e-6)
    # and it must differ from dropping the decay outright
    none_1, _ = two_steps(tx_pre, grads)
    assert not np.allclose(np.asarray(l2_1), np.asarray(none_1), atol=0)


def test_prodigy_requires_params():
    from pairwise_sample_optimization_tpu.train.prodigy import prodigy

    tx = prodigy()
    st = tx.init({"w": jnp.ones(3)})
    with pytest.raises(ValueError):
        tx.update({"w": jnp.ones(3)}, st)


# ------------------------------------------------------------------ #
# DoRA
# ------------------------------------------------------------------ #


def _dora_layer(rank=4, use_dora=True):
    from pairwise_sample_optimization_tpu.models.layers import LoRADense

    layer = LoRADense(6, lora_rank=rank, use_dora=use_dora, dtype=jnp.float32)
    x = jax.random.normal(jax.random.key(1), (3, 5))
    variables = layer.init(jax.random.key(0), x)
    return layer, variables, x


def test_dora_init_is_identity():
    """B zero-init => merged weight == base => magnitude/norm factor == 1
    => DoRA output equals the plain dense output (peft init semantics)."""
    layer, variables, x = _dora_layer()
    base = _dora_layer(use_dora=False)[0]
    y_dora = layer.apply(variables, x)
    y_base = base.apply(
        {"params": variables["params"],
         "lora": {k: v for k, v in variables["lora"].items() if k != "magnitude"}},
        x,
    )
    np.testing.assert_allclose(np.asarray(y_dora), np.asarray(y_base), atol=1e-6)
    # magnitude initialized to the base kernel's column norms
    np.testing.assert_allclose(
        np.asarray(variables["lora"]["magnitude"]),
        np.linalg.norm(np.asarray(variables["params"]["kernel"]), axis=0),
        rtol=1e-6,
    )


def test_dora_magnitude_refresh_after_weight_port():
    """Swapping the kernel (a torch weight port) without refreshing the
    magnitude rescales every column by ||W_random||/||W_loaded|| — the
    adapter must instead stay a no-op at step 0 (peft initializes
    magnitude from the PRETRAINED weight)."""
    from pairwise_sample_optimization_tpu.checkpoints import (
        refresh_dora_magnitudes,
    )

    layer, variables, x = _dora_layer()
    # "port": a different kernel replaces the random-init one
    new_kernel = jax.random.normal(jax.random.key(9), variables["params"]["kernel"].shape)
    new_params = dict(variables["params"], kernel=new_kernel)

    stale = layer.apply({"params": new_params, "lora": variables["lora"]}, x)
    base = _dora_layer(use_dora=False)[0]
    want = base.apply(
        {"params": new_params,
         "lora": {k: v for k, v in variables["lora"].items() if k != "magnitude"}},
        x,
    )
    # stale magnitudes corrupt the ported weights...
    assert np.abs(np.asarray(stale) - np.asarray(want)).max() > 1e-3
    # ...refresh restores the no-op-at-step-0 identity
    fresh_lora = refresh_dora_magnitudes(new_params, variables["lora"])
    got = layer.apply({"params": new_params, "lora": fresh_lora}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fresh_lora["magnitude"]),
        np.linalg.norm(np.asarray(new_kernel), axis=0),
        rtol=1e-6,
    )


def test_dora_matches_hand_formula_and_grads_flow():
    layer, variables, x = _dora_layer()
    lora = dict(variables["lora"])
    lora["b"] = jax.random.normal(jax.random.key(2), lora["b"].shape) * 0.3
    lora["magnitude"] = lora["magnitude"] * 1.5
    v = {"params": variables["params"], "lora": lora}
    got = layer.apply(v, x)

    W = np.asarray(variables["params"]["kernel"], np.float64)
    bias = np.asarray(variables["params"]["bias"], np.float64)
    A = np.asarray(lora["a"], np.float64)
    B = np.asarray(lora["b"], np.float64)
    m = np.asarray(lora["magnitude"], np.float64)
    scaling = 1.0  # alpha == rank
    merged = W + scaling * (A @ B)
    want = (np.asarray(x, np.float64) @ merged) * (
        m / np.linalg.norm(merged, axis=0)
    ) + bias
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    grads = jax.grad(
        lambda lo: jnp.sum(layer.apply({"params": v["params"], "lora": lo}, x) ** 2)
    )(lora)
    for leaf in ("a", "b", "magnitude"):
        assert float(jnp.max(jnp.abs(grads[leaf]))) > 0.0, leaf


def test_dora_static_zero_scale_is_base_layer():
    """lora_scale=0.0 (the frozen-reference pass / peft disable_adapters)
    must return the plain base projection — no magnitude scaling."""
    layer, variables, x = _dora_layer()
    lora = dict(variables["lora"])
    lora["b"] = jnp.ones_like(lora["b"])
    lora["magnitude"] = lora["magnitude"] * 7.0
    got = layer.apply({"params": variables["params"], "lora": lora}, x, 0.0)
    want = (
        np.asarray(x) @ np.asarray(variables["params"]["kernel"])
        + np.asarray(variables["params"]["bias"])
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)


def test_dora_rejects_per_sample_scale():
    layer, variables, x = _dora_layer()
    with pytest.raises(ValueError):
        layer.apply(variables, x, jnp.ones((3,)))


def test_dora_through_unet_tiny():
    from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
    import dataclasses

    cfg = dataclasses.replace(UNetConfig.tiny(lora_rank=2), lora_use_dora=True)
    model = SDXLUNet(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    v = model.init(
        jax.random.key(0), x, jnp.zeros((1,)),
        jnp.zeros((1, 5, cfg.cross_attention_dim)),
        jnp.zeros((1, cfg.pooled_embed_dim)), jnp.zeros((1, 6)),
    )
    mags = [p for p in jax.tree_util.tree_leaves_with_path(v["lora"])
            if p[0][-1].key == "magnitude"]
    assert mags, "no DoRA magnitudes in the UNet lora tree"
    out = model.apply(
        v, x, jnp.zeros((1,)), jnp.zeros((1, 5, cfg.cross_attention_dim)),
        jnp.zeros((1, cfg.pooled_embed_dim)), jnp.zeros((1, 6)), lora_scale=1.0,
    )
    assert jnp.all(jnp.isfinite(out))


def test_dora_dreambooth_pso_unfused_first_step_anchor():
    """DoRA + loss_type=pso needs the unfused ref pass; at init (B=0,
    magnitude == ||W||) policy == reference, so the first-step loss is
    exactly log 2. The fused path must refuse DoRA loudly."""
    import dataclasses

    from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
    from pairwise_sample_optimization_tpu.train import (
        DreamBoothPSOConfig,
        DreamBoothPSOTrainer,
        PSOTrainState,
        make_optimizer,
    )

    ucfg = dataclasses.replace(UNetConfig.tiny(lora_rank=2), lora_use_dora=True)
    model = SDXLUNet(ucfg)

    def unet_apply(v, x, t, cond, s):
        return model.apply(
            v, x, t, cond["embeds"], cond["pooled"], cond["time_ids"], lora_scale=s
        )

    B = 2
    cond = {
        "embeds": jax.random.normal(jax.random.key(1), (B, 5, ucfg.cross_attention_dim)),
        "pooled": jax.random.normal(jax.random.key(2), (B, ucfg.pooled_embed_dim)),
        "time_ids": jnp.tile(jnp.array([[16.0, 16, 0, 0, 16, 16]]), (B, 1)),
    }
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        cond["embeds"][:1], cond["pooled"][:1], cond["time_ids"][:1],
    )
    batch = {
        "instance_latents": jax.random.normal(jax.random.key(3), (B, 8, 8, 4)),
        "negative_latents": jax.random.normal(jax.random.key(4), (B, 8, 8, 4)),
        "cond": cond,
    }
    cfg = DreamBoothPSOConfig(
        loss_type="pso", prior_loss_weight=0.0, fuse_ref_pass=False
    )
    tr = DreamBoothPSOTrainer(cfg, unet_apply, make_optimizer(1e-3))
    st = PSOTrainState.create(jax.tree.map(jnp.copy, variables["lora"]), tr.tx)
    st, aux = tr.update(st, variables["params"], batch, jax.random.key(7))
    assert abs(float(aux["loss"]) - np.log(2.0)) < 1e-4, float(aux["loss"])

    fused = DreamBoothPSOTrainer(
        dataclasses.replace(cfg, fuse_ref_pass=True), unet_apply, make_optimizer(1e-3)
    )
    st2 = PSOTrainState.create(jax.tree.map(jnp.copy, variables["lora"]), fused.tx)
    with pytest.raises(ValueError):
        fused.update(st2, variables["params"], batch, jax.random.key(7))


# ------------------------------------------------------------------ #
# LR schedules
# ------------------------------------------------------------------ #


def test_lr_schedules_match_diffusers_shapes():
    from pairwise_sample_optimization_tpu.train import make_lr_schedule

    lr, w, t = 2e-4, 10, 110
    lin = make_lr_schedule("linear", lr, w, t)
    assert float(lin(0)) == 0.0
    np.testing.assert_allclose(float(lin(w)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(lin(60)), lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(lin(t)), 0.0, atol=1e-10)

    cos = make_lr_schedule("cosine", lr, 0, 100)
    np.testing.assert_allclose(float(cos(0)), lr, rtol=1e-6)
    np.testing.assert_allclose(float(cos(50)), lr * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(cos(100)), 0.0, atol=1e-10)

    cw = make_lr_schedule("constant_with_warmup", lr, 10, 100)
    np.testing.assert_allclose(float(cw(5)), lr * 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(cw(99)), lr, rtol=1e-6)

    # plain "constant" has NO warmup (diffusers semantics)
    const = make_lr_schedule("constant", lr, 500, 100)
    np.testing.assert_allclose(float(const(0)), lr, rtol=1e-6)

    poly = make_lr_schedule("polynomial", lr, 0, 100, power=2.0, lr_end=1e-7)
    np.testing.assert_allclose(float(poly(100)), 1e-7, rtol=1e-5)

    rest = make_lr_schedule("cosine_with_restarts", lr, 0, 100, num_cycles=2)
    np.testing.assert_allclose(float(rest(0)), lr, rtol=1e-6)
    # just before the restart boundary the factor approaches 0; just after
    # it snaps back near lr
    assert float(rest(49)) < 0.01 * lr
    assert float(rest(51)) > 0.9 * lr

    with pytest.raises(ValueError):
        make_lr_schedule("nope", lr, 0, 10)(0)


def test_dreambooth_cli_no_dead_flags():
    """Every parsed DreamBooth CLI flag must be consumed after parsing
    (the reference's parsed-but-dead knobs are carried ONLY as documented
    PARITY-INERT args). Guards against the round-1 class of dead knobs."""
    import inspect
    import re

    from pairwise_sample_optimization_tpu.cli import (
        train_pso_sdxl_turbo_dreambooth as M,
    )

    src = inspect.getsource(M)
    flags = re.findall(r'add_argument\(\s*"--([a-z_0-9]+)"', src)
    assert len(flags) > 40, flags
    inert = {
        f for f in flags
        if re.search(rf'"--{f}"[^)]*PARITY-INERT', src, re.DOTALL)
        and src.index(f'"--{f}"') > 0
    }
    assert inert == {"snr_gamma", "gamma_pso", "neg_generate_freq"}, inert
    body = src[src.index("def _make_optimizer"):]
    dead = [
        f for f in flags
        if f not in inert and not re.search(rf"args\.{f}\b", body)
    ]
    assert not dead, f"parsed but never consumed: {dead}"


@pytest.mark.parametrize("module", ["evaluate_sdxl_dmd2", "generate"])
def test_other_clis_no_dead_flags(module):
    import importlib
    import inspect
    import re

    M = importlib.import_module(
        f"pairwise_sample_optimization_tpu.cli.{module}"
    )
    src = inspect.getsource(M)
    flags = re.findall(r'add_argument\(\s*"--([a-z_0-9]+)"', src)
    assert flags
    body = src[src.index("def main"):]
    dead = [f for f in flags if not re.search(rf"args\.{f}\b", body)]
    assert not dead, f"parsed but never consumed: {dead}"


# ------------------------------------------------------------------ #
# kohya export
# ------------------------------------------------------------------ #


def test_kohya_export_layout():
    from pairwise_sample_optimization_tpu.checkpoints import (
        export_kohya_lora_safetensors,
    )

    r = 2
    site = {"a": np.ones((8, r), np.float32), "b": np.zeros((r, 8), np.float32)}
    tree = {"mid_attn": {"block_0": {"attn1": {"to_q": site}}}}
    out = export_kohya_lora_safetensors({"unet": tree})
    base = "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn1_to_q"
    assert set(out) == {
        base + ".lora_down.weight", base + ".lora_up.weight", base + ".alpha"
    }
    assert out[base + ".lora_down.weight"].shape == (r, 8)
    assert out[base + ".lora_up.weight"].shape == (8, r)
    assert float(out[base + ".alpha"]) == float(r)

    # DoRA magnitude -> .dora_scale
    site["magnitude"] = np.ones((8,), np.float32)
    out = export_kohya_lora_safetensors({"unet": tree})
    assert base + ".dora_scale" in out


def test_dora_magnitude_roundtrips_diffusers_layout():
    from pairwise_sample_optimization_tpu.checkpoints import (
        export_lora_safetensors,
        import_lora_safetensors,
    )

    r = 2
    tree = {
        "mid_attn": {
            "block_0": {
                "attn1": {
                    "to_q": {
                        "a": np.random.default_rng(0).normal(size=(8, r)).astype(np.float32),
                        "b": np.random.default_rng(1).normal(size=(r, 8)).astype(np.float32),
                        "magnitude": np.random.default_rng(2).normal(size=(8,)).astype(np.float32) + 3,
                    }
                }
            }
        }
    }
    sd = export_lora_safetensors(tree)
    assert any(k.endswith(".lora_magnitude_vector") for k in sd)
    back = import_lora_safetensors(sd, jax.tree.map(jnp.asarray, tree))
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6),
        jax.tree.map(jnp.asarray, tree), back,
    )

"""Dynamic-int8 decoder conv: quantization math, dispatch gating, and
end-to-end decoder sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_sample_optimization_tpu.ops import qconv


@pytest.fixture(autouse=True)
def _int8_off_after():
    yield
    qconv.set_use_int8_decode(False)


def test_int8_conv_exact_on_representable_values():
    """Integer-valued inputs/weights within [-127,127] scale ranges are
    quantized losslessly -> the int8 conv (migration off) must be EXACT."""
    x = jnp.asarray(
        np.random.default_rng(0).integers(-127, 128, (2, 6, 6, 4)), jnp.float32
    )
    k = jnp.asarray(
        np.random.default_rng(1).integers(-127, 128, (3, 3, 4, 5)), jnp.float32
    )
    # scales: per-SAMPLE max|x|=127 -> s=1; per-channel kernel max 127 -> s=1
    x = x.at[0, 0, 0, 0].set(127.0)
    x = x.at[1, 0, 0, 0].set(-127.0)
    k = k.at[0, 0, 0].set(127.0)
    b = jnp.arange(5, dtype=jnp.float32)
    got = qconv.int8_conv2d(x, k, b, smooth_alpha=None)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


def test_int8_conv_close_on_random():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16))
    k = jax.random.normal(jax.random.key(1), (3, 3, 16, 8)) * 0.1
    got = qconv.int8_conv2d(x, k)
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert err < 0.05, err  # dynamic per-tensor/per-channel int8 error band


def test_smoothquant_migration_beats_plain_on_outlier_channels():
    """GroupNorm-affine-style channel spread: one activation channel 50x
    hotter than the rest. The outlier migration must (a) stay exactly
    equivalent in fp (conv(x/m, W*m) == conv(x, W)) and (b) cut the
    quantization error materially vs the unsmoothed grid."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 8, 8, 16))
    x = x.at[..., 3].mul(50.0)  # hot channel
    k = jax.random.normal(jax.random.key(1), (3, 3, 16, 8)) * 0.1
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    err_plain = float(jnp.sqrt(jnp.mean(
        (qconv.int8_conv2d(x, k, smooth_alpha=None) - want) ** 2)))
    err_smooth = float(jnp.sqrt(jnp.mean(
        (qconv.int8_conv2d(x, k, smooth_alpha=0.5) - want) ** 2)))
    assert err_smooth < 0.5 * err_plain, (err_smooth, err_plain)


def test_per_sample_activation_scales():
    """A batch mixing a hot and a cold image must quantize each on its
    own grid: the cold image's error matches a solo-batch quantization
    of itself, not the hot image's grid."""
    cold = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    hot = cold * 100.0
    k = jax.random.normal(jax.random.key(1), (3, 3, 16, 8)) * 0.1
    both = jnp.concatenate([hot, cold], axis=0)
    got_pair = qconv.int8_conv2d(both, k, smooth_alpha=None)[1]
    got_solo = qconv.int8_conv2d(cold, k, smooth_alpha=None)[0]
    np.testing.assert_allclose(
        np.asarray(got_pair), np.asarray(got_solo), rtol=0, atol=1e-5
    )


def test_dispatch_gated_globally_and_per_site():
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 3))
    k = jax.random.normal(jax.random.key(1), (3, 3, 3, 2))
    exact = qconv.decoder_conv2d(x, k, allow_int8=True)  # global flag off
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    np.testing.assert_allclose(np.asarray(exact), np.asarray(want), atol=1e-6)

    qconv.set_use_int8_decode(True)
    q = qconv.decoder_conv2d(x, k, allow_int8=True)
    assert float(jnp.max(jnp.abs(q - want))) > 0.0  # quantized path taken
    site_off = qconv.decoder_conv2d(x, k, allow_int8=False)  # UNet sites
    np.testing.assert_allclose(np.asarray(site_off), np.asarray(want), atol=1e-6)


def test_vae_decoder_int8_mode_close_to_fp():
    from pairwise_sample_optimization_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
    v = vae.init(jax.random.key(0), x, jax.random.key(2))
    z = jax.random.normal(jax.random.key(3), (1, 4, 4, cfg.latent_channels))

    ref = vae.apply(v, z, method=vae.decode)
    qconv.set_use_int8_decode(True)
    q = jax.jit(lambda v_, z_: vae.apply(v_, z_, method=vae.decode))(v, z)
    # int8 resnet convs: output stays in a tight relative band of the
    # fp decode (zero-informative weights here; real-weight quality is a
    # user-facing trade the knob documents)
    denom = float(jnp.max(jnp.abs(ref))) + 1e-6
    err = float(jnp.max(jnp.abs(q - ref))) / denom
    assert err < 0.15, err
    # the ENCODER never quantizes: identical under the global flag
    m1, lv1 = vae.apply(v, x, method=vae.encode)
    qconv.set_use_int8_decode(False)
    m0, lv0 = vae.apply(v, x, method=vae.encode)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-6)


def test_int8_decode_image_level_snr():
    """Image-level qualification (round-2 verdict item 5): a full tiny-VAE
    DECODE with the int8 path must stay within a measured SNR of the fp32
    decode — pinning the bound at the image level, not per-conv."""
    from pairwise_sample_optimization_tpu.models.vae import (
        AutoencoderKL,
        VAEConfig,
    )

    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    latents = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    variables = vae.init(jax.random.key(1), latents, method=vae.decode)

    ref = np.asarray(vae.apply(variables, latents, method=vae.decode))
    qconv.set_use_int8_decode(True)
    got = np.asarray(vae.apply(variables, latents, method=vae.decode))

    err = got.astype(np.float64) - ref.astype(np.float64)
    snr_db = 10.0 * np.log10(np.var(ref) / max(np.var(err), 1e-30))
    # dynamic int8 with per-channel weight scales holds >25 dB end to end
    # through the stacked decoder convs (measured ~30+ on random weights;
    # full-size numbers in BENCHMARKS.md via scripts/qualify_int8_decode.py)
    assert snr_db > 25.0, snr_db


# --------------------------------------------------------------------- #
# int8 frozen-reference pass (ops.qconv.int8_ref_pass)
# --------------------------------------------------------------------- #


def test_int8_matmul_exact_on_representable_values():
    """Integer-valued inputs/weights at full-scale grids quantize
    losslessly -> the int8 matmul must be EXACT."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, 5, 8)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 128, (8, 6)), jnp.float32)
    x = x.at[..., 0].set(127.0)  # per-token max -> scale 1
    w = w.at[0].set(127.0)  # per-column max -> scale 1
    b = jnp.arange(6, dtype=jnp.float32)
    got = qconv.int8_matmul(x, w, b)
    want = x @ w + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0, atol=0)


def test_int8_matmul_close_on_random():
    x = jax.random.normal(jax.random.key(0), (2, 16, 32))
    w = jax.random.normal(jax.random.key(1), (32, 24)) * 0.1
    got = qconv.int8_matmul(x, w)
    want = x @ w
    err = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert err < 0.05, err


def test_int8_ref_pass_scope_routes_full_unet():
    """Inside the scope a tiny-UNet lora_scale=0 apply runs its matmuls/
    convs in int8: output must CHANGE (routing proof) but stay within the
    int8 error band of the plain forward (accuracy proof)."""
    from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig

    ucfg = UNetConfig.tiny(lora_rank=2)
    model = SDXLUNet(ucfg)
    b = 2
    cond = dict(
        encoder_hidden_states=jax.random.normal(
            jax.random.key(1), (b, 5, ucfg.cross_attention_dim)
        ),
        pooled_text_embeds=jax.random.normal(
            jax.random.key(2), (b, ucfg.pooled_embed_dim)
        ),
        add_time_ids=jnp.tile(jnp.array([[512.0, 512, 0, 0, 512, 512]]), (b, 1)),
    )
    x = jax.random.normal(jax.random.key(3), (b, 8, 8, 4))
    t = jnp.asarray([499.0, 999.0])
    variables = model.init(jax.random.key(0), x[:1], t[:1], cond["encoder_hidden_states"][:1],
                           cond["pooled_text_embeds"][:1], cond["add_time_ids"][:1])

    plain = np.asarray(model.apply(variables, x, t, **cond, lora_scale=0.0))
    with qconv.int8_ref_pass():
        quant = np.asarray(model.apply(variables, x, t, **cond, lora_scale=0.0))
    after = np.asarray(model.apply(variables, x, t, **cond, lora_scale=0.0))

    assert np.abs(quant - plain).max() > 0, "scope did not route"
    np.testing.assert_allclose(after, plain, atol=0, rtol=0)  # scope exited
    rel = np.abs(quant - plain).max() / max(np.abs(plain).max(), 1e-9)
    assert rel < 0.2, rel


def test_int8_ref_pass_trainer_end_to_end():
    """OnlinePSOConfig(int8_ref_pass=True): the update runs, the loss is
    finite and in the on-policy band (ratios near 1 modulo int8 noise on
    the reference log-probs), LoRA still moves; fused+int8 is rejected."""
    import dataclasses

    from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
    from pairwise_sample_optimization_tpu.train import (
        OnlinePSOConfig,
        OnlinePSOTrainer,
        PSOTrainState,
        make_optimizer,
    )

    ucfg = UNetConfig.tiny(lora_rank=2)
    model = SDXLUNet(ucfg)

    def unet_apply(variables, x, t, cond, lora_scale):
        return model.apply(
            variables, x, t, cond["embeds"], cond["pooled"], cond["time_ids"],
            lora_scale=lora_scale,
        )

    cfg = OnlinePSOConfig(
        sampler="turbo", num_steps=4, train_batch_size=2, grad_accum=1,
        int8_ref_pass=True,
    )
    with pytest.raises(ValueError):
        dataclasses.replace(cfg, fuse_ref_pass=True)

    trainer = OnlinePSOTrainer(
        cfg, unet_apply, make_optimizer(learning_rate=1e-3),
        decode_fn=lambda z: jnp.tanh(z[..., :3]),
        reward_fn=lambda images, rc: jnp.mean(images, axis=(1, 2, 3)),
        latent_hw=8,
    )
    b = 2
    cond = {
        "embeds": jax.random.normal(jax.random.key(1), (b, 5, ucfg.cross_attention_dim)),
        "pooled": jax.random.normal(jax.random.key(2), (b, ucfg.pooled_embed_dim)),
        "time_ids": jnp.tile(jnp.array([[512.0, 512, 0, 0, 512, 512]]), (b, 1)),
    }
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        cond["embeds"][:1], cond["pooled"][:1], cond["time_ids"][:1],
    )
    samples, _ = trainer.sample_pairs(variables, cond, {}, jax.random.key(10))
    state = PSOTrainState.create(variables["lora"], trainer.tx)
    before = jax.tree.map(np.asarray, state.lora)
    state, metrics = trainer.train_epoch(
        state, variables["params"], samples, cond, jax.random.key(11)
    )
    loss = metrics[0]["loss"]
    assert np.isfinite(loss)
    # the int8 noise on the REFERENCE log-probs perturbs the log(2) anchor
    # but must stay in its neighborhood (beta=50 amplifies real drift)
    assert 0.1 < loss < 3.0, loss
    moved = [
        np.abs(a - np.asarray(v)).max()
        for a, v in zip(jax.tree.leaves(before), jax.tree.leaves(state.lora))
    ]
    assert max(moved) > 0


class TestInt8ScorerTower:
    """Dynamic-int8 CLIP vision MLP (VERDICT r4 #7): the int8 tower must
    share the bf16 tower's parameter tree bit-for-bit and keep the
    pairwise ranking it feeds stable."""

    def _scorers(self):
        import dataclasses

        from pairwise_sample_optimization_tpu.models.clip import (
            CLIPTextConfig,
            CLIPVisionConfig,
        )
        from pairwise_sample_optimization_tpu.rewards import PickScoreScorer

        base = PickScoreScorer(
            text_config=CLIPTextConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            key=jax.random.key(3),
        )
        q = PickScoreScorer(
            variables=base.variables,  # SAME weights — tree-compatible
            text_config=CLIPTextConfig.tiny(),
            vision_config=dataclasses.replace(
                CLIPVisionConfig.tiny(), int8_mlp=True
            ),
        )
        return base, q

    def test_param_tree_compatible_and_scores_close(self):
        base, q = self._scorers()
        imgs = jax.random.uniform(jax.random.key(1), (4, 28, 28, 3)) * 2 - 1
        f_base = np.asarray(base._image_features_v(base.variables, imgs))
        f_q = np.asarray(q._image_features_v(q.variables, imgs))
        assert np.isfinite(f_q).all()
        # normalized features: int8 MLP error stays small at fp32 params
        assert np.abs(f_base - f_q).max() < 0.15, np.abs(f_base - f_q).max()
        cos = np.sum(f_base * f_q, axis=-1)  # both L2-normalized
        assert (cos > 0.98).all(), cos

    def test_global_override_routes_vision_only(self):
        from pairwise_sample_optimization_tpu.models.clip import (
            CLIPTextConfig,
            CLIPVisionConfig,
        )
        from pairwise_sample_optimization_tpu.rewards import PickScoreScorer

        base = PickScoreScorer(
            text_config=CLIPTextConfig.tiny(),
            vision_config=CLIPVisionConfig.tiny(),
            key=jax.random.key(3),
        )
        imgs = jax.random.uniform(jax.random.key(1), (2, 28, 28, 3)) * 2 - 1
        ids = jnp.ones((2, 5), jnp.int32)
        f0 = np.asarray(base._image_features_v(base.variables, imgs))
        t0 = np.asarray(base._text_features_v(base.variables, ids))
        qconv.set_use_int8_scorer(True)
        try:
            q = PickScoreScorer(
                variables=base.variables,
                text_config=CLIPTextConfig.tiny(),
                vision_config=CLIPVisionConfig.tiny(),
            )
            f1 = np.asarray(q._image_features_v(q.variables, imgs))
            t1 = np.asarray(q._text_features_v(q.variables, ids))
        finally:
            qconv.set_use_int8_scorer(False)
        assert np.abs(f1 - f0).max() > 0  # vision path changed
        np.testing.assert_array_equal(t1, t0)  # text path untouched

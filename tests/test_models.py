"""Model shape/semantics tests on tiny configs (CPU, 8 fake devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from pairwise_sample_optimization_tpu.models import (
    AutoencoderKL,
    CLIPDualEncoder,
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
    SDXLUNet,
    UNetConfig,
    VAEConfig,
)

B = 2


def _unet_inputs(cfg: UNetConfig, hw=8):
    k = jax.random.key(0)
    return dict(
        sample=jax.random.normal(k, (B, hw, hw, cfg.in_channels)),
        timesteps=jnp.array([999, 499]),
        encoder_hidden_states=jax.random.normal(k, (B, 10, cfg.cross_attention_dim)),
        pooled_text_embeds=jax.random.normal(k, (B, cfg.pooled_embed_dim)),
        add_time_ids=jnp.tile(jnp.array([[512, 512, 0, 0, 512, 512]]), (B, 1)),
    )


class TestUNet:
    def test_forward_shape(self):
        cfg = UNetConfig.tiny()
        model = SDXLUNet(cfg)
        inputs = _unet_inputs(cfg)
        variables = model.init(jax.random.key(0), **inputs)
        out = model.apply(variables, **inputs)
        assert out.shape == (B, 8, 8, cfg.out_channels)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()

    def test_lora_zero_scale_equals_no_lora(self):
        inputs = _unet_inputs(UNetConfig.tiny())
        cfg_l = UNetConfig.tiny(lora_rank=4)
        model_l = SDXLUNet(cfg_l)
        vars_l = model_l.init(jax.random.key(0), **inputs)
        assert "lora" in vars_l
        # b is zero-initialized -> scale 1 output == scale 0 output at init
        out0 = model_l.apply(vars_l, **inputs, lora_scale=0.0)
        out1 = model_l.apply(vars_l, **inputs, lora_scale=1.0)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)

        # perturb b -> scale matters now, scale 0 still matches original
        lora = jax.tree.map(lambda x: x + 0.1, vars_l["lora"])
        out0_p = model_l.apply({"params": vars_l["params"], "lora": lora}, **inputs, lora_scale=0.0)
        out1_p = model_l.apply({"params": vars_l["params"], "lora": lora}, **inputs, lora_scale=1.0)
        np.testing.assert_allclose(np.asarray(out0_p), np.asarray(out0), atol=1e-6)
        assert np.abs(np.asarray(out1_p) - np.asarray(out0)).max() > 1e-4

    def test_lora_only_gradients(self):
        cfg = UNetConfig.tiny(lora_rank=4)
        model = SDXLUNet(cfg)
        inputs = _unet_inputs(cfg)
        variables = model.init(jax.random.key(0), **inputs)

        def loss_fn(lora):
            out = model.apply(
                {"params": variables["params"], "lora": lora}, **inputs, lora_scale=1.0
            )
            return jnp.sum(out**2)

        g = jax.grad(loss_fn)(variables["lora"])
        norms = [float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)]
        assert all(np.isfinite(norms))
        assert sum(norms) > 0  # a-grads nonzero even while b == 0

    def test_remat_modes_match_no_remat(self):
        """Every remat mode is a pure scheduling choice: outputs and LoRA
        grads must match the no-remat program bit-for-bit-ish (fp32 CPU)."""
        import dataclasses

        base = UNetConfig.tiny(lora_rank=4)
        inputs = _unet_inputs(base)
        model0 = SDXLUNet(base)
        variables = model0.init(jax.random.key(0), **inputs)

        def loss_fn(cfg):
            model = SDXLUNet(cfg)

            def f(lora):
                out = model.apply(
                    {"params": variables["params"], "lora": lora},
                    **inputs,
                    lora_scale=1.0,
                )
                return jnp.sum(out**2), out

            return jax.value_and_grad(f, has_aux=True)(variables["lora"])

        (l0, out0), g0 = loss_fn(base)
        for mode in ("full", "resnets", "dots", "lowres", "lowres_dots"):
            cfg = dataclasses.replace(base, remat=mode)
            (l1, out1), g1 = loss_fn(cfg)
            np.testing.assert_allclose(
                np.asarray(out1), np.asarray(out0), atol=1e-5, err_msg=mode
            )
            # grads see recompute-order noise (different contraction order
            # in the rematerialized backward): tolerance is ~1e-5 relative
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b),
                    atol=1e-4, rtol=1e-5, err_msg=mode,
                ),
                g1,
                g0,
            )

    def test_sdxl_param_count(self):
        # full SDXL UNet must land at the known ~2.57B scale; eval_shape only
        cfg = UNetConfig.sdxl()
        model = SDXLUNet(cfg)
        inputs = dict(
            sample=jnp.zeros((1, 64, 64, 4)),
            timesteps=jnp.zeros((1,)),
            encoder_hidden_states=jnp.zeros((1, 77, 2048)),
            pooled_text_embeds=jnp.zeros((1, 1280)),
            add_time_ids=jnp.zeros((1, 6)),
        )
        shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), **inputs))
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"]))
        assert 2.4e9 < n < 2.7e9, f"SDXL UNet param count {n:,} out of range"

    def test_lora_param_count_sdxl(self):
        cfg = UNetConfig.sdxl(lora_rank=32)
        model = SDXLUNet(cfg)
        inputs = dict(
            sample=jnp.zeros((1, 64, 64, 4)),
            timesteps=jnp.zeros((1,)),
            encoder_hidden_states=jnp.zeros((1, 77, 2048)),
            pooled_text_embeds=jnp.zeros((1, 1280)),
            add_time_ids=jnp.zeros((1, 6)),
        )
        shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), **inputs))
        n_lora = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["lora"]))
        # r=32 on every SDXL attention q/k/v/out projection: sum over blocks of
        # r*(in+out) = 14*r*c + 2*r*2048 per basic block -> ~46M
        assert 40e6 < n_lora < 55e6, f"LoRA param count {n_lora:,} out of range"


class TestVAE:
    def test_roundtrip_shapes(self):
        cfg = VAEConfig.tiny()
        model = AutoencoderKL(cfg)
        x = jax.random.normal(jax.random.key(0), (B, 16, 16, 3))
        variables = model.init(jax.random.key(1), x, jax.random.key(2))
        z = model.apply(variables, x, jax.random.key(3), method=model.sample_latents)
        # 2 levels -> one downsample -> 8x8 latents
        assert z.shape == (B, 8, 8, cfg.latent_channels)
        img = model.apply(variables, z, method=model.decode)
        assert img.shape == (B, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_sdxl_vae_downscale_8x(self):
        cfg = VAEConfig.sdxl()
        model = AutoencoderKL(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.key(0), x, jax.random.key(1))
        )
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"]))
        # AutoencoderKL is ~84M params
        assert 70e6 < n < 100e6, f"VAE param count {n:,}"


class TestCLIP:
    def test_text_tower_outputs(self):
        cfg = CLIPTextConfig.tiny()
        model = CLIPTextTower(cfg)
        ids = jnp.array([[1, 5, 999, 0, 0], [2, 999, 0, 0, 0]])
        variables = model.init(jax.random.key(0), ids)
        out = model.apply(variables, ids)
        assert out["last_hidden_state"].shape == (2, 5, cfg.width)
        assert out["penultimate"].shape == (2, 5, cfg.width)
        assert out["pooled"].shape == (2, cfg.width)
        assert out["projected"].shape == (2, cfg.projection_dim)
        # pooled picks the EOS (max-id) position
        final = out["last_hidden_state"]
        np.testing.assert_allclose(
            np.asarray(out["pooled"][0]), np.asarray(final[0, 2]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out["pooled"][1]), np.asarray(final[1, 1]), rtol=1e-6
        )

    def test_causality(self):
        cfg = CLIPTextConfig.tiny()
        model = CLIPTextTower(cfg)
        ids = jnp.array([[1, 5, 7, 9, 999]])
        variables = model.init(jax.random.key(0), ids)
        out1 = model.apply(variables, ids)["last_hidden_state"]
        ids2 = ids.at[0, 4].set(998)  # change the last token
        out2 = model.apply(variables, ids2)["last_hidden_state"]
        # earlier positions unchanged under causal masking
        np.testing.assert_allclose(
            np.asarray(out1[0, :4]), np.asarray(out2[0, :4]), atol=1e-5
        )

    def test_dual_encoder_score_path(self):
        model = CLIPDualEncoder(CLIPTextConfig.tiny(), CLIPVisionConfig.tiny())
        pixels = jax.random.normal(jax.random.key(0), (2, 28, 28, 3))
        ids = jnp.array([[1, 999, 0], [3, 999, 0]])
        variables = model.init(jax.random.key(1), pixels, ids)
        img, txt, scale = model.apply(variables, pixels, ids)
        assert img.shape == (2, 16) and txt.shape == (2, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(img), axis=-1), 1.0, rtol=1e-5
        )
        scores = np.diag(np.asarray(txt) @ np.asarray(img).T)
        assert scores.shape == (2,)

    def test_vision_tower_patches(self):
        cfg = CLIPVisionConfig.tiny()
        model = CLIPVisionTower(cfg)
        pixels = jnp.zeros((1, 28, 28, 3))
        variables = model.init(jax.random.key(0), pixels)
        out = model.apply(variables, pixels)
        assert out.shape == (1, cfg.projection_dim)

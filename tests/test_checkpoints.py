"""Checkpoint/converter tests: name-map bijectivity and orbax roundtrip."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pairwise_sample_optimization_tpu.checkpoints import (
    export_lora_safetensors,
    flax_to_torch,
    import_lora_safetensors,
    latest_checkpoint,
    restore_train_state,
    save_train_state,
    torch_to_flax,
    unet_param_map,
    vae_param_map,
    clip_text_param_map,
    clip_vision_param_map,
)
from pairwise_sample_optimization_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextTower,
    CLIPVisionConfig,
    CLIPVisionTower,
    SDXLUNet,
    UNetConfig,
    VAEConfig,
)
from pairwise_sample_optimization_tpu.train import PSOTrainState, make_optimizer


def _tree_equal(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def _unet_variables(lora_rank=0):
    cfg = UNetConfig.tiny(lora_rank=lora_rank)
    model = SDXLUNet(cfg)
    return cfg, model.init(
        jax.random.key(0),
        jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,)),
        jnp.zeros((1, 5, cfg.cross_attention_dim)),
        jnp.zeros((1, cfg.pooled_embed_dim)),
        jnp.zeros((1, 6)),
    )


class TestUNetRoundtrip:
    def test_roundtrip_and_coverage(self):
        cfg, variables = _unet_variables()
        nm = functools.partial(unet_param_map, n_levels=2)
        torch_sd = flax_to_torch(variables["params"], nm)
        back, unused = torch_to_flax(torch_sd, variables["params"], nm)
        assert unused == []
        assert _tree_equal(variables["params"], back)

    def test_expected_key_names(self):
        cfg, variables = _unet_variables()
        nm = functools.partial(unet_param_map, n_levels=2)
        torch_sd = flax_to_torch(variables["params"], nm)
        # spot checks against real diffusers SDXL UNet key grammar
        assert "conv_in.weight" in torch_sd
        assert "time_embedding.linear_1.weight" in torch_sd
        assert "add_embedding.linear_2.bias" in torch_sd
        assert (
            "down_blocks.1.attentions.0.transformer_blocks.0.attn2.to_q.weight"
            in torch_sd
        )
        assert (
            "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj.weight"
            in torch_sd
        )
        assert "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.2.bias" in torch_sd
        assert "down_blocks.0.downsamplers.0.conv.weight" in torch_sd
        assert "mid_block.attentions.0.transformer_blocks.0.attn1.to_out.0.weight" in torch_sd
        assert "mid_block.resnets.1.time_emb_proj.weight" in torch_sd
        # tiny: up level 1 -> up_blocks.0 (reversed), upsample on level 1
        assert "up_blocks.0.upsamplers.0.conv.weight" in torch_sd
        assert "up_blocks.1.resnets.0.conv_shortcut.weight" in torch_sd
        assert "conv_norm_out.weight" in torch_sd

    def test_linear_transposed_conv_permuted(self):
        cfg, variables = _unet_variables()
        nm = functools.partial(unet_param_map, n_levels=2)
        torch_sd = flax_to_torch(variables["params"], nm)
        flax_k = variables["params"]["conv_in"]["kernel"]  # (3,3,in,out)
        assert torch_sd["conv_in.weight"].shape == (
            flax_k.shape[3],
            flax_k.shape[2],
            3,
            3,
        )
        flax_l = variables["params"]["time_embedding"]["linear_1"]["kernel"]
        assert torch_sd["time_embedding.linear_1.weight"].shape == flax_l.shape[::-1]


class TestVAERoundtrip:
    def test_roundtrip(self):
        cfg = VAEConfig.tiny()
        model = AutoencoderKL(cfg)
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jax.random.key(1)
        )
        nm = functools.partial(vae_param_map, n_levels=2)
        torch_sd = flax_to_torch(variables["params"], nm)
        assert "encoder.down_blocks.0.resnets.0.conv1.weight" in torch_sd
        assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in torch_sd
        assert "quant_conv.weight" in torch_sd
        assert "encoder.mid_block.attentions.0.group_norm.weight" in torch_sd
        back, unused = torch_to_flax(torch_sd, variables["params"], nm)
        assert unused == []
        assert _tree_equal(variables["params"], back)


class TestCLIPRoundtrip:
    def test_text(self):
        model = CLIPTextTower(CLIPTextConfig.tiny())
        variables = model.init(jax.random.key(0), jnp.zeros((1, 5), jnp.int32))
        torch_sd = flax_to_torch(variables["params"], clip_text_param_map)
        assert "text_model.embeddings.token_embedding.weight" in torch_sd
        assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in torch_sd
        assert "text_model.final_layer_norm.weight" in torch_sd
        assert "text_projection.weight" in torch_sd
        back, unused = torch_to_flax(torch_sd, variables["params"], clip_text_param_map)
        assert unused == []
        assert _tree_equal(variables["params"], back)

    def test_vision(self):
        model = CLIPVisionTower(CLIPVisionConfig.tiny())
        variables = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 3)))
        torch_sd = flax_to_torch(variables["params"], clip_vision_param_map)
        assert "vision_model.embeddings.patch_embedding.weight" in torch_sd
        assert "vision_model.pre_layrnorm.weight" in torch_sd  # HF's typo'd key
        assert "visual_projection.weight" in torch_sd
        back, unused = torch_to_flax(torch_sd, variables["params"], clip_vision_param_map)
        assert unused == []
        assert _tree_equal(variables["params"], back)


class TestLoRAInterop:
    def test_roundtrip_and_names(self, tmp_path):
        cfg, variables = _unet_variables(lora_rank=4)
        path = str(tmp_path / "pytorch_lora_weights.safetensors")
        sd = export_lora_safetensors(variables["lora"], path, n_levels=2)
        # diffusers-layout key grammar
        assert any(k.endswith(".lora.down.weight") for k in sd)
        assert any(
            k.startswith("unet.down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q")
            for k in sd
        )
        down = [k for k in sd if k.endswith("lora.down.weight")][0]
        assert sd[down].shape[0] == 4  # (r, in)

        back = import_lora_safetensors(path, variables["lora"], n_levels=2)
        assert _tree_equal(variables["lora"], back)

    def test_peft_alt_keys(self):
        cfg, variables = _unet_variables(lora_rank=4)
        sd = export_lora_safetensors(variables["lora"], n_levels=2)
        alt = {
            k.replace(".lora.down.weight", ".lora_A.weight").replace(
                ".lora.up.weight", ".lora_B.weight"
            ): v
            for k, v in sd.items()
        }
        back = import_lora_safetensors(alt, variables["lora"], n_levels=2)
        assert _tree_equal(variables["lora"], back)


class TestOrbax:
    def test_prune_checkpoints(self, tmp_path):
        from pairwise_sample_optimization_tpu.checkpoints.orbax_io import (
            prune_checkpoints,
        )

        cfg, variables = _unet_variables(lora_rank=2)
        tx = make_optimizer()
        state = PSOTrainState.create(variables["lora"], tx)
        base = str(tmp_path / "run")
        for step in (10, 20, 30, 40):
            save_train_state(base, step, state)
        removed = prune_checkpoints(base, keep=2)
        assert len(removed) == 2
        left = sorted(p for p in __import__("os").listdir(base) if p.startswith("checkpoint"))
        assert left == ["checkpoint-30", "checkpoint-40"]

    def test_save_restore_latest(self, tmp_path):
        cfg, variables = _unet_variables(lora_rank=2)
        tx = make_optimizer()
        state = PSOTrainState.create(variables["lora"], tx)
        base = str(tmp_path / "run")
        save_train_state(base, 100, state, {"epoch": 7})
        save_train_state(base, 200, state._replace(step=jnp.asarray(200)), {"epoch": 9})

        assert latest_checkpoint(base).endswith("checkpoint-200")
        restored, extra = restore_train_state(
            latest_checkpoint(base), jax.eval_shape(lambda: state), {"epoch": 0}
        )
        assert int(restored.step) == 200
        assert extra["epoch"] == 9
        assert _tree_equal(restored.lora, state.lora)

"""SDXLPipeline integration: generation paths + diffusers-dir weight port."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pairwise_sample_optimization_tpu.checkpoints import flax_to_torch
from pairwise_sample_optimization_tpu.checkpoints.torch_names import (
    clip_text_param_map,
    unet_param_map,
    vae_param_map,
)
from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline


def _tiny_pipe(key=0):
    return SDXLPipeline.random(tiny=True, resolution=16, key=jax.random.key(key))


def _tok(pipe, prompts):
    from pairwise_sample_optimization_tpu.data import HashTokenizer

    tok = HashTokenizer(vocab_size=pipe.te1.config.vocab_size)
    return jnp.asarray(tok(prompts))


class TestGeneration:
    def test_turbo_generate(self):
        pipe = _tiny_pipe()
        ids = _tok(pipe, ["a cat", "a dog"])
        cond = pipe.encode_prompt(ids, ids)
        img = pipe.generate(cond, jax.random.key(1), num_steps=4)
        assert img.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_dmd_generate(self):
        pipe = _tiny_pipe()
        ids = _tok(pipe, ["a cat"])
        cond = pipe.encode_prompt(ids, ids)
        img = pipe.generate_dmd(cond, jax.random.key(2), num_steps=4)
        assert img.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_generate_deterministic_in_key(self):
        pipe = _tiny_pipe()
        ids = _tok(pipe, ["a cat"])
        cond = pipe.encode_prompt(ids, ids)
        a = pipe.generate(cond, jax.random.key(3))
        b = pipe.generate(cond, jax.random.key(3))
        c = pipe.generate(cond, jax.random.key(4))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-4


class TestFromTorchDir:
    def test_roundtrip_through_diffusers_layout(self, tmp_path):
        """Export a pipeline's weights to a fake diffusers checkpoint dir
        (torch-layout safetensors) and load them back: outputs must match
        the source pipeline exactly — the full weight-porting path."""
        from safetensors.numpy import save_file

        src = _tiny_pipe(key=7)
        n_unet = len(src.unet_config.block_out_channels)
        n_vae = len(src.vae.config.block_out_channels)
        exports = [
            ("unet", src.unet_variables["params"],
             functools.partial(unet_param_map, n_levels=n_unet)),
            ("vae", src.vae_variables["params"],
             functools.partial(vae_param_map, n_levels=n_vae)),
            ("text_encoder", src.te1_variables["params"], clip_text_param_map),
            ("text_encoder_2", src.te2_variables["params"], clip_text_param_map),
        ]
        for sub, params, nm in exports:
            d = tmp_path / sub
            d.mkdir()
            sd = {k: np.asarray(v, np.float32) for k, v in flax_to_torch(params, nm).items()}
            save_file(sd, str(d / "model.safetensors"))

        dst = SDXLPipeline.from_torch_dir(str(tmp_path), tiny=True, resolution=16)
        ids = _tok(src, ["a photo of a corgi"])
        cond_src = src.encode_prompt(ids, ids)
        cond_dst = dst.encode_prompt(ids, ids)
        np.testing.assert_allclose(
            np.asarray(cond_src["embeds"]), np.asarray(cond_dst["embeds"]),
            rtol=1e-5, atol=1e-5,
        )
        img_src = src.generate(cond_src, jax.random.key(9))
        img_dst = dst.generate(cond_dst, jax.random.key(9))
        np.testing.assert_allclose(
            np.asarray(img_src), np.asarray(img_dst), rtol=1e-4, atol=1e-4
        )

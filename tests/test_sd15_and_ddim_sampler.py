"""SD1.x UNet family + CFG-DDIM trajectory sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
from pairwise_sample_optimization_tpu.ops import (
    ddim_step_with_logprob,
    make_alphas_cumprod,
)
from pairwise_sample_optimization_tpu.train.sampling import (
    sample_ddim_cfg_trajectories,
)

B = 2


def _tiny_sd15():
    return UNetConfig(
        block_out_channels=(16, 32),
        transformer_layers=(1, 0),
        mid_transformer_layers=1,
        layers_per_block=1,
        fixed_num_heads=4,
        cross_attention_dim=16,
        use_text_time=False,
        norm_groups=8,
        dtype=jnp.float32,
    )


class TestSD15Family:
    def test_forward_without_micro_conditioning(self):
        cfg = _tiny_sd15()
        model = SDXLUNet(cfg)
        x = jax.random.normal(jax.random.key(0), (B, 8, 8, 4))
        ctx = jax.random.normal(jax.random.key(1), (B, 5, cfg.cross_attention_dim))
        variables = model.init(jax.random.key(2), x, jnp.zeros((B,)), ctx)
        out = model.apply(variables, x, jnp.array([500.0, 10.0]), ctx)
        assert out.shape == (B, 8, 8, 4)
        assert np.isfinite(np.asarray(out)).all()
        # no add_embedding params when text_time is off
        assert "add_embedding" not in variables["params"]

    def test_fixed_heads_convention(self):
        cfg = _tiny_sd15()
        assert cfg.heads_for(16) == (4, 4)
        assert cfg.heads_for(32) == (4, 8)
        sdxl = UNetConfig.sdxl()
        assert sdxl.heads_for(640) == (10, 64)

    def test_sd15_param_count(self):
        cfg = UNetConfig.sd15()
        model = SDXLUNet(cfg)
        inputs = dict(
            sample=jnp.zeros((1, 64, 64, 4)),
            timesteps=jnp.zeros((1,)),
            encoder_hidden_states=jnp.zeros((1, 77, 768)),
        )
        shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), **inputs))
        n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"]))
        assert 0.75e9 < n < 1.0e9, f"SD1.5 UNet param count {n:,}"


class TestDDIMCFGSampler:
    def setup_method(self):
        self.ac = make_alphas_cumprod()
        self.ts = jnp.asarray([801, 601, 401, 201, 1], jnp.int32)
        self.init = jax.random.normal(jax.random.key(0), (B, 8, 8, 4))

    def test_shapes_and_transition_identity(self):
        def eps_cfg(x, t):
            return 0.05 * x

        traj = sample_ddim_cfg_trajectories(
            eps_cfg, self.ac, self.ts, self.init, jax.random.key(1)
        )
        s = len(self.ts)
        assert traj.latents.shape == (s + 1, B, 8, 8, 4)
        assert traj.log_probs.shape == (s, B)
        assert np.isfinite(np.asarray(traj.log_probs)).all()
        # recompute each stored transition's logprob
        prev_ts = list(self.ts[1:]) + [-1]
        for j in range(s):
            t = jnp.full((B,), self.ts[j], jnp.int32)
            tp = jnp.full((B,), prev_ts[j], jnp.int32)
            _, lp = ddim_step_with_logprob(
                self.ac,
                0.05 * traj.latents[j],
                t,
                tp,
                traj.latents[j],
                prev_sample=traj.latents[j + 1],
                eta=1.0,
            )
            np.testing.assert_allclose(
                np.asarray(lp), np.asarray(traj.log_probs[j]), rtol=1e-4, atol=1e-4
            )

    def test_cfg_mixing_path(self):
        """End-to-end with a real CFG closure over the tiny SD1.x UNet."""
        cfg = _tiny_sd15()
        model = SDXLUNet(cfg)
        ctx_cond = jax.random.normal(jax.random.key(3), (B, 5, cfg.cross_attention_dim))
        ctx_uncond = jnp.zeros_like(ctx_cond)
        variables = model.init(
            jax.random.key(4), self.init, jnp.zeros((B,)), ctx_cond
        )
        g = 7.5

        def eps_cfg(x, t):
            both = model.apply(
                variables,
                jnp.concatenate([x, x], 0),
                jnp.tile(t, 2),
                jnp.concatenate([ctx_uncond, ctx_cond], 0),
            )
            eps_u, eps_c = jnp.split(both, 2)
            return eps_u + g * (eps_c - eps_u)

        traj = sample_ddim_cfg_trajectories(
            eps_cfg, self.ac, self.ts, self.init, jax.random.key(5)
        )
        assert np.isfinite(np.asarray(traj.final_latents)).all()

"""Step/logprob kernel numerics vs closed-form Gaussian densities (scipy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from pairwise_sample_optimization_tpu.ops import (
    ddim_step_with_logprob,
    distilled_logprob,
    distilled_step_with_logprob,
    make_alphas_cumprod,
    make_euler_ancestral_schedule,
    turbo_logprob,
    turbo_step_with_logprob,
)
from pairwise_sample_optimization_tpu.ops.euler_ancestral import scale_model_input

B, C, H, W = 3, 4, 8, 8


def _rand(key, *shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


class TestTurboStep:
    def setup_method(self):
        self.sched = make_euler_ancestral_schedule(4)
        k = jax.random.key(0)
        self.x = _rand(k, B, H, W, C) * float(self.sched.init_noise_sigma)
        self.eps = _rand(jax.random.fold_in(k, 1), B, H, W, C)

    def test_mean_matches_numpy(self):
        idx = jnp.zeros((B,), jnp.int32)
        x_prev, _ = turbo_step_with_logprob(
            self.sched, self.eps, idx, self.x, jax.random.key(7)
        )
        # independent numpy computation of the ancestral mean
        s = np.asarray(self.sched.sigmas, np.float64)
        up = float(self.sched.sigma_up[0])
        down = float(self.sched.sigma_down[0])
        x = np.asarray(self.x, np.float64)
        e = np.asarray(self.eps, np.float64)
        mean = x + e * (down - s[0])
        # x_prev = mean + up * noise, so residual/up must be standard normal-ish
        resid = (np.asarray(x_prev, np.float64) - mean) / up
        assert abs(resid.mean()) < 0.1
        assert abs(resid.std() - 1.0) < 0.1

    def test_logprob_matches_scipy(self):
        idx = jnp.ones((B,), jnp.int32)
        key = jax.random.key(3)
        x_prev, lp = turbo_step_with_logprob(self.sched, self.eps, idx, self.x, key)
        up = float(self.sched.sigma_up[1])
        down = float(self.sched.sigma_down[1])
        s1 = float(self.sched.sigmas[1])
        mean = np.asarray(self.x) + np.asarray(self.eps) * (down - s1)
        want = stats.norm.logpdf(np.asarray(x_prev), loc=mean, scale=up)
        want = want.reshape(B, -1).mean(-1)
        np.testing.assert_allclose(np.asarray(lp), want, rtol=1e-4, atol=1e-4)

    def test_recompute_equals_sample_logprob(self):
        idx = jnp.full((B,), 2, jnp.int32)
        x_prev, lp_sample = turbo_step_with_logprob(
            self.sched, self.eps, idx, self.x, jax.random.key(11)
        )
        lp_re = turbo_logprob(self.sched, self.eps, idx, self.x, x_prev)
        np.testing.assert_allclose(np.asarray(lp_re), np.asarray(lp_sample), rtol=1e-6)

    def test_batched_heterogeneous_steps(self):
        # each batch element can be at a different denoise step (train shuffle)
        idx = jnp.asarray([0, 1, 2], jnp.int32)
        lp = turbo_logprob(self.sched, self.eps, idx, self.x, self.x * 0.9)
        per = [
            turbo_logprob(
                self.sched,
                self.eps[i : i + 1],
                idx[i : i + 1],
                self.x[i : i + 1],
                self.x[i : i + 1] * 0.9,
            )[0]
            for i in range(B)
        ]
        np.testing.assert_allclose(np.asarray(lp), np.asarray(jnp.stack(per)), rtol=1e-6)

    def test_gradient_flows_through_eps_only(self):
        idx = jnp.ones((B,), jnp.int32)

        def loss_fn(eps):
            return turbo_logprob(self.sched, eps, idx, self.x, self.x * 0.5).sum()

        g = jax.grad(loss_fn)(self.eps)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_scale_model_input(self):
        idx = jnp.zeros((B,), jnp.int32)
        scaled = scale_model_input(self.sched, self.x, idx)
        s0 = float(self.sched.sigmas[0])
        np.testing.assert_allclose(
            np.asarray(scaled),
            np.asarray(self.x) / np.sqrt(s0**2 + 1),
            rtol=1e-6,
        )


class TestDistilledStep:
    def setup_method(self):
        self.ac = make_alphas_cumprod()
        k = jax.random.key(5)
        self.x = _rand(k, B, H, W, C)
        self.eps = _rand(jax.random.fold_in(k, 1), B, H, W, C)
        self.t = jnp.full((B,), 999, jnp.int32)
        self.t_prev = jnp.full((B,), 749, jnp.int32)

    def test_logprob_matches_scipy(self):
        x_prev, lp = distilled_step_with_logprob(
            self.ac, self.eps, self.t, self.t_prev, self.x, jax.random.key(2)
        )
        a_t = float(self.ac[999])
        a_p = float(self.ac[749])
        x0 = (np.asarray(self.x) - np.sqrt(1 - a_t) * np.asarray(self.eps)) / np.sqrt(a_t)
        mean = np.sqrt(a_p) * x0
        std = np.sqrt(1 - a_p)
        want = stats.norm.logpdf(np.asarray(x_prev), loc=mean, scale=std)
        want = want.reshape(B, -1).mean(-1)
        np.testing.assert_allclose(np.asarray(lp), want, rtol=1e-4, atol=1e-4)

    def test_shared_noise_quirk(self):
        # reference parity: one noise draw broadcast over the batch
        x_prev, _ = distilled_step_with_logprob(
            self.ac,
            jnp.zeros_like(self.eps),
            self.t,
            self.t_prev,
            jnp.zeros_like(self.x),
            jax.random.key(0),
            shared_noise=True,
        )
        xp = np.asarray(x_prev)
        np.testing.assert_allclose(xp[0], xp[1], rtol=1e-6)

    def test_iid_noise_variant(self):
        x_prev, _ = distilled_step_with_logprob(
            self.ac,
            jnp.zeros_like(self.eps),
            self.t,
            self.t_prev,
            jnp.zeros_like(self.x),
            jax.random.key(0),
            shared_noise=False,
        )
        xp = np.asarray(x_prev)
        assert np.abs(xp[0] - xp[1]).max() > 1e-3

    def test_recompute_matches(self):
        x_prev, lp1 = distilled_step_with_logprob(
            self.ac, self.eps, self.t, self.t_prev, self.x, jax.random.key(9)
        )
        lp2 = distilled_logprob(self.ac, self.eps, self.t, self.t_prev, self.x, x_prev)
        np.testing.assert_allclose(np.asarray(lp2), np.asarray(lp1), rtol=1e-5)


class TestDDIMStep:
    def setup_method(self):
        self.ac = make_alphas_cumprod()
        k = jax.random.key(8)
        self.x = _rand(k, B, H, W, C)
        self.eps = _rand(jax.random.fold_in(k, 2), B, H, W, C)

    @pytest.mark.parametrize("ptype", ["epsilon", "sample", "v_prediction"])
    def test_runs_and_finite(self, ptype):
        t = jnp.full((B,), 801, jnp.int32)
        tp = jnp.full((B,), 601, jnp.int32)
        x_prev, lp = ddim_step_with_logprob(
            self.ac, self.eps, t, tp, self.x, key=jax.random.key(1),
            prediction_type=ptype,
        )
        assert np.isfinite(np.asarray(x_prev)).all()
        assert np.isfinite(np.asarray(lp)).all()

    def test_eta0_is_deterministic_mean(self):
        t = jnp.full((B,), 801, jnp.int32)
        tp = jnp.full((B,), 601, jnp.int32)
        a, _ = ddim_step_with_logprob(
            self.ac, self.eps, t, tp, self.x, key=jax.random.key(1), eta=0.0
        )
        b, _ = ddim_step_with_logprob(
            self.ac, self.eps, t, tp, self.x, key=jax.random.key(2), eta=0.0
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_logprob_matches_scipy(self):
        t = jnp.full((B,), 801, jnp.int32)
        tp = jnp.full((B,), 601, jnp.int32)
        x_prev, lp = ddim_step_with_logprob(
            self.ac, self.eps, t, tp, self.x, key=jax.random.key(4), eta=1.0
        )
        a_t, a_p = float(self.ac[801]), float(self.ac[601])
        var = (1 - a_p) / (1 - a_t) * (1 - a_t / a_p)
        std = np.sqrt(var)
        x0 = (np.asarray(self.x) - np.sqrt(1 - a_t) * np.asarray(self.eps)) / np.sqrt(a_t)
        direction = np.sqrt(1 - a_p - var) * np.asarray(self.eps)
        mean = np.sqrt(a_p) * x0 + direction
        want = stats.norm.logpdf(np.asarray(x_prev), loc=mean, scale=std)
        want = want.reshape(B, -1).mean(-1)
        np.testing.assert_allclose(np.asarray(lp), want, rtol=1e-4, atol=1e-4)

"""Trajectory sampler and loss tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pairwise_sample_optimization_tpu.ops import (
    make_alphas_cumprod,
    make_euler_ancestral_schedule,
)
from pairwise_sample_optimization_tpu.ops.euler_ancestral import turbo_logprob
from pairwise_sample_optimization_tpu.ops.ddpm_renoise import distilled_logprob
from pairwise_sample_optimization_tpu.train import (
    pareto_compare,
    pso_pairwise_loss,
    sample_compare,
    sample_dmd_trajectories,
    sample_turbo_trajectories,
    dreambooth_pso_loss,
)

B, HW, C = 2, 8, 4


def _linear_eps(x, t):
    return 0.05 * x


class TestTurboSampler:
    def setup_method(self):
        self.sched = make_euler_ancestral_schedule(4)
        self.init = jax.random.normal(jax.random.key(0), (B, HW, HW, C))

    def test_shapes(self):
        traj = sample_turbo_trajectories(_linear_eps, self.sched, self.init, jax.random.key(1))
        assert traj.latents.shape == (4, B, HW, HW, C)
        assert traj.input_latents.shape == (3, B, HW, HW, C)
        assert traj.log_probs.shape == (3, B)
        assert traj.final_latents.shape == (B, HW, HW, C)
        assert np.isfinite(np.asarray(traj.log_probs)).all()
        assert np.isfinite(np.asarray(traj.final_latents)).all()

    def test_onpolicy_recompute_identity(self):
        """Recomputing a stored transition's logprob with the same eps must
        reproduce the sampling-time logprob exactly (the DPO on-policy
        anchor: at step 0 ratio pi/pi_ref == 1)."""
        traj = sample_turbo_trajectories(_linear_eps, self.sched, self.init, jax.random.key(1))
        for j in range(3):
            idxs = jnp.full((B,), j, jnp.int32)
            eps = _linear_eps(None, None) if False else 0.05 * traj.input_latents[j]
            lp = turbo_logprob(self.sched, eps, idxs, traj.latents[j], traj.latents[j + 1])
            np.testing.assert_allclose(
                np.asarray(lp), np.asarray(traj.log_probs[j]), rtol=1e-5
            )

    def test_deterministic_given_key(self):
        t1 = sample_turbo_trajectories(_linear_eps, self.sched, self.init, jax.random.key(2))
        t2 = sample_turbo_trajectories(_linear_eps, self.sched, self.init, jax.random.key(2))
        np.testing.assert_allclose(np.asarray(t1.final_latents), np.asarray(t2.final_latents))
        t3 = sample_turbo_trajectories(_linear_eps, self.sched, self.init, jax.random.key(3))
        assert np.abs(np.asarray(t1.final_latents) - np.asarray(t3.final_latents)).max() > 1e-3


class TestDMDSampler:
    def setup_method(self):
        self.ac = make_alphas_cumprod()
        self.ts = jnp.asarray([999, 749, 499, 249], jnp.int32)
        self.init = jax.random.normal(jax.random.key(0), (B, HW, HW, C))

    def test_shapes(self):
        traj = sample_dmd_trajectories(_linear_eps, self.ac, self.ts, self.init, jax.random.key(1))
        assert traj.latents.shape == (4, B, HW, HW, C)
        assert traj.log_probs.shape == (3, B)
        assert np.isfinite(np.asarray(traj.final_latents)).all()

    def test_onpolicy_recompute_identity(self):
        traj = sample_dmd_trajectories(_linear_eps, self.ac, self.ts, self.init, jax.random.key(1))
        for j in range(3):
            t = jnp.full((B,), self.ts[j], jnp.int32)
            # training uses prev_timestep = t - step_ratio (=250), which for
            # the [999,749,499,249] lattice equals the next lattice point
            tp = t - 250
            eps = 0.05 * traj.latents[j]
            lp = distilled_logprob(self.ac, eps, t, tp, traj.latents[j], traj.latents[j + 1])
            np.testing.assert_allclose(
                np.asarray(lp), np.asarray(traj.log_probs[j]), rtol=1e-4
            )


class TestComparators:
    def test_sample_compare_single_axis(self):
        a = jnp.asarray([[1.0], [2.0], [3.0]])
        b = jnp.asarray([[2.0], [1.0], [3.0]])
        c = np.asarray(sample_compare(a, b, jax.random.key(0)))
        # a<b -> b wins [-1,1]; a>b -> a wins [1,-1]; tie -> b wins (ref quirk)
        np.testing.assert_array_equal(c[0], [-1, 1])
        np.testing.assert_array_equal(c[1], [1, -1])
        np.testing.assert_array_equal(c[2], [-1, 1])

    def test_pareto_compare(self):
        a = jnp.asarray([[1.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
        b = jnp.asarray([[2.0, 2.0], [1.0, 1.0], [2.0, 1.0]])
        c = np.asarray(pareto_compare(a, b))
        np.testing.assert_array_equal(c[0], [-1, 1])  # b dominates
        np.testing.assert_array_equal(c[1], [1, -1])  # a dominates
        np.testing.assert_array_equal(c[2], [0, 0])  # incomparable

    def test_pareto_1d(self):
        c = np.asarray(pareto_compare(jnp.asarray([1.0, 3.0]), jnp.asarray([2.0, 2.0])))
        np.testing.assert_array_equal(c, [[-1, 1], [1, -1]])


class TestPairwiseLoss:
    def test_zero_ratio_gives_log2(self):
        z = jnp.zeros((4,))
        prefer = jnp.tile(jnp.asarray([[-1.0, 1.0]]), (4, 1))
        loss = pso_pairwise_loss(z, z, z, z, prefer, beta=50.0, eps=0.1)
        np.testing.assert_allclose(float(loss), np.log(2.0), rtol=1e-6)

    def test_winner_higher_ratio_lowers_loss(self):
        z = jnp.zeros((4,))
        up = jnp.full((4,), 0.05)
        prefer = jnp.tile(jnp.asarray([[-1.0, 1.0]]), (4, 1))  # traj1 wins
        better = pso_pairwise_loss(z, z, up, z, prefer, beta=50.0, eps=0.1)
        worse = pso_pairwise_loss(up, z, z, z, prefer, beta=50.0, eps=0.1)
        assert float(better) < np.log(2.0) < float(worse)

    def test_clamp_bounds_loss(self):
        z = jnp.zeros((4,))
        huge = jnp.full((4,), 100.0)
        prefer = jnp.tile(jnp.asarray([[-1.0, 1.0]]), (4, 1))
        loss = pso_pairwise_loss(z, z, huge, z, prefer, beta=50.0, eps=0.1)
        # inner logit bounded by beta*log(1.1) -> loss bounded away from 0
        want = -np.log(1 / (1 + np.exp(-50 * np.log(1.1))))
        np.testing.assert_allclose(float(loss), want, rtol=2e-3)

    def test_clamp_modes_agree_in_bounds(self):
        """Inside the clamp band all three modes coincide; outside, the
        two clamped modes agree with each other but not with 'none'."""
        z = jnp.zeros((4,))
        small = jnp.full((4,), 0.01)  # |log ratio| < log(1.1)
        prefer = jnp.tile(jnp.asarray([[-1.0, 1.0]]), (4, 1))
        vals = [
            float(pso_pairwise_loss(z, z, small, z, prefer, 50.0, 0.1, clamp_mode=m))
            for m in ("ratio", "logratio", "none")
        ]
        np.testing.assert_allclose(vals[0], vals[1], rtol=1e-5)
        np.testing.assert_allclose(vals[0], vals[2], rtol=1e-5)

        big = jnp.full((4,), 2.0)  # far outside the band
        v_ratio = float(pso_pairwise_loss(z, z, big, z, prefer, 50.0, 0.1, clamp_mode="ratio"))
        v_logr = float(pso_pairwise_loss(z, z, big, z, prefer, 50.0, 0.1, clamp_mode="logratio"))
        v_none = float(pso_pairwise_loss(z, z, big, z, prefer, 50.0, 0.1, clamp_mode="none"))
        np.testing.assert_allclose(v_ratio, v_logr, rtol=1e-4)
        assert v_none < v_ratio  # unclamped saturates the sigmoid

    def test_gradient_finite(self):
        prefer = jnp.tile(jnp.asarray([[1.0, -1.0]]), (3, 1))

        def f(lp):
            return pso_pairwise_loss(
                lp, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), prefer, 50.0, 0.1
            )

        g = jax.grad(f)(jnp.full((3,), 0.01))
        assert np.isfinite(np.asarray(g)).all()


class TestDreamBoothLoss:
    def test_pso_logistic(self):
        w = jnp.asarray([0.1, 0.2])
        l = jnp.asarray([0.3, 0.1])
        rw = jnp.asarray([0.2, 0.2])
        rl = jnp.asarray([0.2, 0.2])
        loss, logits = dreambooth_pso_loss(w, l, rw, rl, beta=5.0, loss_type="pso")
        model_diff = np.asarray(w) - np.asarray(l)
        want_logits = 0.0 - model_diff
        np.testing.assert_allclose(np.asarray(logits), want_logits, rtol=1e-6)
        want = -np.mean(np.log(1 / (1 + np.exp(-5.0 * want_logits))))
        np.testing.assert_allclose(float(loss), want, rtol=1e-4)

    def test_pso_db_hinge(self):
        w = jnp.asarray([0.1])
        l = jnp.asarray([0.5])
        loss, logits = dreambooth_pso_loss(w, l, None, None, beta=5.0, loss_type="pso_db")
        # logits = -(w - l) = 0.4 -> relu(1 - 2.0) = 0
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_prior_preservation(self):
        w = jnp.asarray([0.1])
        l = jnp.asarray([0.5])
        base, _ = dreambooth_pso_loss(w, l, None, None, 5.0, "pso_db")
        with_prior, _ = dreambooth_pso_loss(
            w, l, None, None, 5.0, "pso_db", prior_loss_weight=0.5
        )
        np.testing.assert_allclose(float(with_prior) - float(base), 0.25, rtol=1e-6)

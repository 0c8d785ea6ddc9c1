"""Frozen-fixture regression anchors for the scheduler/logprob kernels.

The fixtures were recorded from the verified implementation (tested
against scipy closed forms); any numerics drift — dtype policy changes,
table construction edits, PRNG-path changes — trips these.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pairwise_sample_optimization_tpu.ops import (
    ddim_step_with_logprob,
    distilled_step_with_logprob,
    make_alphas_cumprod,
    make_euler_ancestral_schedule,
    turbo_step_with_logprob,
)

FIX = np.load(os.path.join(os.path.dirname(__file__), "fixtures", "scheduler_goldens.npz"))


def test_turbo_golden():
    sched = make_euler_ancestral_schedule(4)
    x = jnp.asarray(FIX["x"]) * sched.init_noise_sigma
    idx = jnp.asarray([0, 2], jnp.int32)
    xp, lp = turbo_step_with_logprob(
        sched, jnp.asarray(FIX["eps"]), idx, x, jax.random.key(7)
    )
    np.testing.assert_allclose(np.asarray(xp), FIX["turbo_xprev"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp), FIX["turbo_logprob"], rtol=2e-5)


def test_distilled_golden():
    ac = make_alphas_cumprod()
    t = jnp.asarray([999, 499], jnp.int32)
    tp = jnp.asarray([749, 249], jnp.int32)
    xp, lp = distilled_step_with_logprob(
        ac, jnp.asarray(FIX["eps"]), t, tp, jnp.asarray(FIX["x"]), jax.random.key(9)
    )
    np.testing.assert_allclose(np.asarray(xp), FIX["dist_xprev"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp), FIX["dist_logprob"], rtol=2e-5)


def test_ddim_golden():
    ac = make_alphas_cumprod()
    t = jnp.asarray([999, 499], jnp.int32)
    tp = jnp.asarray([749, 249], jnp.int32)
    xp, lp = ddim_step_with_logprob(
        ac, jnp.asarray(FIX["eps"]), t, tp, jnp.asarray(FIX["x"]),
        key=jax.random.key(11), eta=1.0,
    )
    np.testing.assert_allclose(np.asarray(xp), FIX["ddim_xprev"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(lp), FIX["ddim_logprob"], rtol=2e-5)

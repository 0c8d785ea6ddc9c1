"""Schedule table construction tests against independent NumPy math."""

import numpy as np
import pytest

from pairwise_sample_optimization_tpu.ops import (
    NoiseScheduleConfig,
    distill_timesteps,
    make_alphas_cumprod,
    make_euler_ancestral_schedule,
)


def test_turbo_4step_timesteps_trailing():
    sched = make_euler_ancestral_schedule(4)
    assert sched.timesteps.tolist() == [999, 749, 499, 249]
    assert sched.sigmas.shape == (5,)
    assert float(sched.sigmas[-1]) == 0.0


@pytest.mark.parametrize("n", [1, 2, 4])
def test_turbo_nstep_monotone_sigmas(n):
    sched = make_euler_ancestral_schedule(n)
    s = np.asarray(sched.sigmas)
    assert np.all(np.diff(s) < 0), "sigmas must be strictly decreasing"
    assert float(sched.init_noise_sigma) == pytest.approx(float(s[0]))


def test_sigma_split_identity():
    # sigma_down^2 + sigma_up^2 == sigma_to^2 per ancestral construction
    sched = make_euler_ancestral_schedule(4)
    s = np.asarray(sched.sigmas, dtype=np.float64)
    up = np.asarray(sched.sigma_up, dtype=np.float64)
    down = np.asarray(sched.sigma_down, dtype=np.float64)
    np.testing.assert_allclose(down**2 + up**2, s[1:] ** 2, rtol=1e-5)
    # last step is deterministic: sigma_to = 0 -> up = down = 0
    assert up[-1] == 0.0 and down[-1] == 0.0


def test_alphas_cumprod_scaled_linear():
    ac = np.asarray(make_alphas_cumprod())
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    ref = np.cumprod(1 - betas)
    np.testing.assert_allclose(ac, ref, rtol=2e-5)
    assert ac.shape == (1000,)


def test_distill_timesteps_lattice():
    assert distill_timesteps(4).tolist() == [999, 749, 499, 249]
    assert distill_timesteps(8).tolist() == [999, 874, 749, 624, 499, 374, 249, 124]
    assert distill_timesteps(1).tolist() == [999]


def test_sigmas_match_interp_of_full_table():
    cfg = NoiseScheduleConfig()
    sched = make_euler_ancestral_schedule(4, cfg)
    betas = np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, 1000) ** 2
    ac = np.cumprod(1 - betas)
    sig_full = np.sqrt((1 - ac) / ac)
    want = np.interp([999, 749, 499, 249], np.arange(1000), sig_full)
    np.testing.assert_allclose(np.asarray(sched.sigmas[:4]), want, rtol=1e-5)

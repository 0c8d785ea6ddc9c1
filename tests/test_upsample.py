"""Subpixel upsample+conv rewrite: equivalence with the naive path.

The VAE decoder / UNet up-blocks compute nearest-2x upsample then 3x3
conv (reference diffusers ``Upsample2D``); ``ops.upsample`` rewrites it
as 4 parity 2x2 convs on the coarse grid. These tests pin exact
functional equivalence (fp32, CPU), gradients, and that the module keeps
``nn.Conv``-compatible param naming for checkpoint interop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_sample_optimization_tpu.ops import upsample as ups


@pytest.fixture(autouse=True)
def _subpixel_on():
    """Dispatch defaults to the naive path (BENCHMARKS.md); force the
    subpixel rewrite here so these tests exercise it."""
    prev = ups._USE_SUBPIXEL
    ups.set_use_subpixel(True)
    yield
    ups.set_use_subpixel(prev)


def _naive(x, k, b):
    y = jax.lax.conv_general_dilated(
        ups.nearest_upsample_2x(x), k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


@pytest.mark.parametrize("hw", [(4, 4), (5, 7), (1, 3)])
def test_subpixel_matches_naive_fp32(hw):
    h, w = hw
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, h, w, 6), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (3, 3, 6, 5), jnp.float32)
    b = jax.random.normal(jax.random.key(2), (5,), jnp.float32)
    got = ups.upsample2x_conv3x3(x, k, b)
    want = _naive(x, k, b)
    assert got.shape == (2, 2 * h, 2 * w, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_subpixel_gradients_match_naive():
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 3), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (3, 3, 3, 2), jnp.float32)
    b = jnp.zeros((2,))

    def loss_sub(x, k, b):
        return jnp.sum(jnp.sin(ups.upsample2x_conv3x3(x, k, b)))

    def loss_naive(x, k, b):
        return jnp.sum(jnp.sin(_naive(x, k, b)))

    g1 = jax.grad(loss_sub, argnums=(0, 1, 2))(x, k, b)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(x, k, b)
    for a, e in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-5)


def test_dispatch_flag_falls_back():
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 3), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (3, 3, 3, 2), jnp.float32)
    ups.set_use_subpixel(False)
    a = ups.upsample2x_conv3x3(x, k, None)
    ups.set_use_subpixel(True)
    b = ups.upsample2x_conv3x3(x, k, None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_upsample_module_param_naming():
    from pairwise_sample_optimization_tpu.models.layers import Upsample

    m = Upsample(8, dtype=jnp.float32)
    v = m.init(jax.random.key(0), jnp.zeros((1, 4, 4, 8)))
    assert set(v["params"].keys()) == {"conv"}
    assert v["params"]["conv"]["kernel"].shape == (3, 3, 8, 8)
    assert v["params"]["conv"]["bias"].shape == (8,)

"""Fused GroupNorm+SiLU Pallas kernel vs the jnp reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_sample_optimization_tpu.ops import fused_groupnorm as fg
from pairwise_sample_optimization_tpu.ops.group_norm import group_norm


@pytest.fixture(autouse=True)
def _interpret():
    fg.set_interpret(True)
    yield
    fg.set_interpret(False)


@pytest.mark.parametrize(
    "b,h,w,c,groups",
    [
        (2, 8, 8, 128, 32),
        (1, 16, 16, 256, 32),
        (2, 8, 8, 64, 8),  # tiny-config shapes
    ],
)
def test_matches_reference(b, h, w, c, groups):
    x = jax.random.normal(jax.random.key(0), (b, h, w, c), jnp.float32) * 2 + 0.5
    scale = jax.random.normal(jax.random.key(1), (c,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.key(2), (c,)) * 0.1
    out = fg.fused_groupnorm_silu(x, scale, bias, groups)
    ref = group_norm(x, scale, bias, groups, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_multi_tile_rows():
    # force row tiling by shrinking the tile budget
    old = fg._MAX_TILE_ELEMS
    fg._MAX_TILE_ELEMS = 8 * 128
    try:
        x = jax.random.normal(jax.random.key(3), (1, 8, 8, 128))
        scale = jnp.ones((128,))
        bias = jnp.zeros((128,))
        out = fg.fused_groupnorm_silu(x, scale, bias, 32)
        ref = group_norm(x, scale, bias, 32, act="silu")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    finally:
        fg._MAX_TILE_ELEMS = old


def test_bf16():
    x = jax.random.normal(jax.random.key(4), (1, 8, 8, 128), jnp.bfloat16)
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    out = fg.fused_groupnorm_silu(x, scale, bias, 32)
    assert out.dtype == jnp.bfloat16
    ref = group_norm(x, scale, bias, 32, act="silu")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_dispatch_seam():
    from pairwise_sample_optimization_tpu.ops import group_norm as gn

    x = jax.random.normal(jax.random.key(5), (1, 8, 8, 128))
    scale = jnp.ones((128,))
    bias = jnp.zeros((128,))
    ref = gn.group_norm(x, scale, bias, 32, act="silu")
    gn.set_use_pallas(True, min_elems=0)
    try:
        out = gn.group_norm(x, scale, bias, 32, act="silu")
    finally:
        gn.set_use_pallas(False, min_elems=4 * 1024 * 1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

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


def test_gradients_match_reference():
    x = jax.random.normal(jax.random.key(6), (1, 8, 8, 64)) + 0.3
    scale = jnp.ones((64,)) * 1.1
    bias = jnp.full((64,), 0.05)
    w = jax.random.normal(jax.random.key(7), x.shape)

    gp = jax.grad(
        lambda x, s, b: jnp.sum(fg.fused_groupnorm_silu(x, s, b, 8) * w),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    gr = jax.grad(
        lambda x, s, b: jnp.sum(group_norm(x, s, b, 8, act="silu") * w),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_chunked_decode_matches_full():
    from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline

    pipe = SDXLPipeline.random(tiny=True, resolution=16, with_text_encoders=False)
    z = jax.random.normal(jax.random.key(8), (4, 8, 8, 4))
    full = pipe.decode(z)
    pipe.decode_chunk = 2
    chunked = pipe.decode(z)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), rtol=1e-5, atol=1e-5)


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

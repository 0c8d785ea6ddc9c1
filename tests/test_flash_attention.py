"""Pallas flash attention vs the naive reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairwise_sample_optimization_tpu.ops import flash_attention as fa
from pairwise_sample_optimization_tpu.ops.attention import dot_product_attention


@pytest.fixture(autouse=True)
def _interpret():
    fa.set_interpret(True)
    yield
    fa.set_interpret(False)


def _rand(key, shape):
    return jax.random.normal(jax.random.key(key), shape, jnp.float32)


@pytest.mark.parametrize(
    "b,sq,skv,h,d",
    [
        (2, 128, 128, 2, 64),  # small self-attention
        (1, 256, 256, 2, 64),  # multi-tile q and kv
        (2, 128, 77, 2, 64),  # cross-attention with kv padding
    ],
)
def test_forward_matches_naive(b, sq, skv, h, d):
    q, k, v = _rand(0, (b, sq, h, d)), _rand(1, (b, skv, h, d)), _rand(2, (b, skv, h, d))
    out = fa.flash_attention(q, k, v)
    ref = dot_product_attention(q, k, v, impl="naive")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_gradients_match_naive():
    b, sq, skv, h, d = 1, 128, 128, 2, 64
    q, k, v = _rand(3, (b, sq, h, d)), _rand(4, (b, skv, h, d)), _rand(5, (b, skv, h, d))
    w = _rand(6, (b, sq, h, d))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) * w)

    def loss_naive(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, impl="naive") * w)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_n = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_f, g_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3)


def test_gradients_match_naive_padded_kv():
    b, sq, skv, h, d = 1, 128, 77, 2, 64
    q, k, v = _rand(7, (b, sq, h, d)), _rand(8, (b, skv, h, d)), _rand(9, (b, skv, h, d))
    w = _rand(10, (b, sq, h, d))

    g_f = jax.grad(lambda q, k, v: jnp.sum(fa.flash_attention(q, k, v) * w), (0, 1, 2))(q, k, v)
    g_n = jax.grad(
        lambda q, k, v: jnp.sum(dot_product_attention(q, k, v, impl="naive") * w),
        (0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(g_f, g_n):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=5e-3, atol=5e-3)


def test_bf16_inputs():
    b, s, h, d = 1, 128, 2, 64
    q = _rand(11, (b, s, h, d)).astype(jnp.bfloat16)
    k = _rand(12, (b, s, h, d)).astype(jnp.bfloat16)
    v = _rand(13, (b, s, h, d)).astype(jnp.bfloat16)
    out = fa.flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = dot_product_attention(q, k, v, impl="naive")
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=3e-2, atol=3e-2
    )


def test_dispatch_routes_pallas():
    from pairwise_sample_optimization_tpu.ops import attention as att

    q = _rand(14, (1, 128, 2, 64))
    out = att.dot_product_attention(q, q, q, impl="pallas")
    ref = att.dot_product_attention(q, q, q, impl="naive")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_block_sizes_d_aware():
    """Forward bk cap is 1024 for narrow heads (RTT-amortized sweep win)
    but stays 512 for wide heads: bk=1024 at the VAE mid-block's d512
    head is a measured 16M-scoped-VMEM compile OOM on v5e."""
    assert fa._block_sizes(4096, 4096, d=64) == (1024, 1024)
    assert fa._block_sizes(16384, 16384, d=512) == (1024, 512)
    # user-set caps still respected below the d-gate
    fa.set_fwd_block_caps(512, 256)
    try:
        assert fa._block_sizes(4096, 4096, d=64) == (512, 256)
        assert fa._block_sizes(16384, 16384, d=512) == (512, 256)
    finally:
        fa.set_fwd_block_caps(1024, 1024)

"""Pallas fused GroupNorm+SiLU for NHWC activations.

The UNet/VAE ResNet blocks apply GroupNorm(32) + SiLU before every conv
(reference relies on cuDNN's implicit fusions). Two row-tiled kernels:

1. stats: accumulate per-group sum/sumsq across row tiles into a
   (B, 8, 128) buffer (group stats padded onto one lane tile) — the
   matmul-style revisit-and-accumulate output pattern;
2. normalize: one more pass over row tiles applying
   (x - mean) * rsqrt(var + eps) * scale + bias then SiLU.

VMEM-safe for the large VAE decoder activations (512x512x128) because a
tile never exceeds (rows_tile, C). Off by default — XLA's own GN fusion
is competitive; this is the explicit-fusion seam
(``ops.group_norm.set_use_pallas``) for shapes where it wins.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
_STAT_LANES = 128
_MAX_TILE_ELEMS = 512 * 1024  # fp32 elements per x tile (~2 MB)


def set_interpret(flag: bool) -> None:
    global _INTERPRET
    _INTERPRET = flag


def _row_tile(rows: int, c: int) -> int:
    tile = max(8, min(rows, _MAX_TILE_ELEMS // c))
    while rows % tile:
        tile -= 1
    return tile


def _group_onehot(c: int, cg: int):
    """(C, LANES) membership matrix: col g is 1 where channel // cg == g.

    Group reductions become matmuls — Mosaic cannot split the lane dim by
    a non-tile-aligned group size (reshape (R,C)->(R,G,cg) fails to lower).
    """
    cidx = jax.lax.broadcasted_iota(jnp.int32, (c, _STAT_LANES), 0)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (c, _STAT_LANES), 1)
    return (cidx // cg == gidx).astype(jnp.float32)


def _stats_kernel(x_ref, stats_ref, *, num_groups):
    r_idx = pl.program_id(1)

    x = x_ref[0].astype(jnp.float32)  # (R, C)
    r, c = x.shape
    member = _group_onehot(c, c // num_groups)  # (C, LANES)
    colsum = jnp.sum(x, axis=0, keepdims=True)  # (1, C)
    colsq = jnp.sum(x * x, axis=0, keepdims=True)
    sums = jax.lax.dot(colsum, member, preferred_element_type=jnp.float32)
    sumsq = jax.lax.dot(colsq, member, preferred_element_type=jnp.float32)
    block = jnp.concatenate(
        [sums, sumsq, jnp.zeros((6, _STAT_LANES), jnp.float32)], axis=0
    )  # (8, LANES) sublane tile

    @pl.when(r_idx == 0)
    def _init():
        stats_ref[0] = block

    @pl.when(r_idx != 0)
    def _acc():
        stats_ref[0] = stats_ref[0] + block


def _norm_kernel(x_ref, stats_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, n_rows):
    x = x_ref[0].astype(jnp.float32)  # (R, C)
    r, c = x.shape
    cg = c // num_groups
    n = n_rows * cg

    stats = stats_ref[0]  # (8, LANES)
    sums = stats[0:1, :]  # (1, LANES); pad lanes are zero -> harmless
    sumsq = stats[1:2, :]
    mean = sums / n
    var = sumsq / n - mean * mean
    inv = jax.lax.rsqrt(var + eps)

    # scatter group stats back to channels via the transposed membership
    member_t = _group_onehot(c, cg).T  # (LANES, C)
    mean_b = jax.lax.dot(mean, member_t, preferred_element_type=jnp.float32)
    inv_b = jax.lax.dot(inv, member_t, preferred_element_type=jnp.float32)
    y = (x - mean_b) * inv_b
    y = y * scale_ref[0][None, :].astype(jnp.float32) + bias_ref[0][None, :].astype(
        jnp.float32
    )
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_groupnorm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """x (B, H, W, C) -> silu(groupnorm(x) * scale + bias).

    Differentiable: forward runs the tiled Pallas kernels; backward
    recomputes through the jnp reference implementation (identical math;
    training-scale activations fit XLA's fp32 temps comfortably).
    """
    return _fused_groupnorm_silu_fwd_only(x, scale, bias, num_groups, eps)


def _fused_groupnorm_silu_fwd_only(x, scale, bias, num_groups, eps):
    b, h, w, c = x.shape
    rows = h * w
    assert c % num_groups == 0 and num_groups <= _STAT_LANES
    tile = _row_tile(rows, c)
    n_tiles = rows // tile
    xr = x.reshape(b, rows, c)
    scale2 = scale.reshape(1, c)
    bias2 = bias.reshape(1, c)

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, num_groups=num_groups),
        grid=(b, n_tiles),
        in_specs=[pl.BlockSpec((1, tile, c), lambda i, r: (i, r, 0))],
        out_specs=pl.BlockSpec((1, 8, _STAT_LANES), lambda i, r: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 8, _STAT_LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xr)

    out = pl.pallas_call(
        functools.partial(
            _norm_kernel, num_groups=num_groups, eps=eps, n_rows=rows
        ),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda i, r: (i, r, 0)),
            pl.BlockSpec((1, 8, _STAT_LANES), lambda i, r: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, r: (0, 0)),
            pl.BlockSpec((1, c), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile, c), lambda i, r: (i, r, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_INTERPRET,
    )(xr, stats, scale2, bias2)
    return out.reshape(b, h, w, c)


def _reference_gn_silu(x, scale, bias, num_groups, eps):
    # call the pure-jnp path directly (avoid dispatch recursion)
    from . import group_norm as _gn_mod
    from .group_norm import group_norm

    saved = _gn_mod._USE_PALLAS
    _gn_mod._USE_PALLAS = False
    try:
        return group_norm(x, scale, bias, num_groups, eps, act="silu")
    finally:
        _gn_mod._USE_PALLAS = saved


def _fgs_fwd(x, scale, bias, num_groups, eps):
    return _fused_groupnorm_silu_fwd_only(x, scale, bias, num_groups, eps), (
        x,
        scale,
        bias,
    )


def _fgs_bwd(num_groups, eps, residuals, g):
    x, scale, bias = residuals
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _reference_gn_silu(x_, s_, b_, num_groups, eps),
        x,
        scale,
        bias,
    )
    return vjp(g)


fused_groupnorm_silu.defvjp(_fgs_fwd, _fgs_bwd)

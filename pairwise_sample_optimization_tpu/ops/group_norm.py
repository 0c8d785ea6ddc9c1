"""GroupNorm (+ optional fused SiLU) — the UNet ResNet-block hot op.

Seam for the Pallas fused kernel (reference's cuDNN fused ops are
implicit; here the fusion point is explicit). The jnp path computes
statistics in fp32 and lets XLA fuse the normalize+SiLU elementwise chain
into neighbouring ops; the Pallas kernel (ops/fused_groupnorm.py) takes
over for large NHWC activations when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_USE_PALLAS = False
# pallas wins module-isolated on decoder-scale activations (3.4 vs
# 3.9 ms at 512^2 x128) but costs ~3% in the full 512^2 program — the
# custom call blocks fusion with the surrounding convs (BENCHMARKS.md
# headline matrix). Default OFF; the 1024^2 DMD2 config turns it on
# (kernels.fused_groupnorm) where the tiled kernel also bounds the
# normalization's activation peak. Gate by element count when enabled.
_PALLAS_MIN_ELEMS = 4 * 1024 * 1024


def set_use_pallas(flag: bool, min_elems: int | None = None) -> None:
    global _USE_PALLAS, _PALLAS_MIN_ELEMS
    _USE_PALLAS = flag
    if min_elems is not None:
        _PALLAS_MIN_ELEMS = min_elems


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    act: str | None = None,
) -> jnp.ndarray:
    """NHWC group norm; ``act='silu'`` fuses the activation.

    x: (..., C); scale/bias: (C,).
    """
    if (
        _USE_PALLAS
        and x.ndim == 4
        and act == "silu"
        and x.shape[1] * x.shape[2] * x.shape[3] >= _PALLAS_MIN_ELEMS
    ):
        from .fused_groupnorm import fused_groupnorm_silu

        return fused_groupnorm_silu(x, scale, bias, num_groups, eps)

    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    orig_dtype = x.dtype
    # stats over all spatial dims + channels-within-group
    red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    if orig_dtype == jnp.float32:
        # exact two-pass stats (the upcast is free for fp32 inputs)
        grouped = x.reshape(x.shape[:-1] + (num_groups, c // num_groups))
        mean = grouped.mean(axis=red_axes, keepdims=True)
        var = grouped.var(axis=red_axes, keepdims=True)
    else:
        # sub-fp32 inputs: a materialized x.astype(f32) copy is the
        # single largest HBM temp of the VAE decode ([2B,512,512,128]
        # f32 in the B>=10 OOM dumps). fp32-ACCUMULATED reductions on
        # the bf16 array instead (flax-normalization style E[x^2]-E[x]^2;
        # the convert fuses into the reduce, nothing f32-sized is
        # materialized) and a fused convert->normalize->silu chain below.
        grouped = x.reshape(x.shape[:-1] + (num_groups, c // num_groups))
        mean = jnp.mean(grouped, axis=red_axes, keepdims=True, dtype=jnp.float32)
        msq = jnp.mean(
            jnp.square(grouped.astype(jnp.float32)),
            axis=red_axes,
            keepdims=True,
        )
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
    normed = (grouped.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(x.shape)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(f"unknown act: {act}")
    return out.astype(orig_dtype)

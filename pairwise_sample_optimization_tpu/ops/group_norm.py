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


def set_use_pallas(flag: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


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
    if _USE_PALLAS and x.ndim == 4 and act == "silu":
        from .fused_groupnorm import fused_groupnorm_silu

        return fused_groupnorm_silu(x, scale, bias, num_groups, eps)

    c = x.shape[-1]
    assert c % num_groups == 0, (c, num_groups)
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    grouped = xf.reshape(x.shape[:-1] + (num_groups, c // num_groups))
    # stats over all spatial dims + channels-within-group
    red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
    mean = grouped.mean(axis=red_axes, keepdims=True)
    var = grouped.var(axis=red_axes, keepdims=True)
    normed = (grouped - mean) * jax.lax.rsqrt(var + eps)
    normed = normed.reshape(x.shape)
    out = normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    elif act is not None:
        raise ValueError(f"unknown act: {act}")
    return out.astype(orig_dtype)

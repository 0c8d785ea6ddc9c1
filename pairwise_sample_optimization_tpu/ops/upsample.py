"""Nearest-2x upsample + 3x3 conv, as one subpixel convolution.

The VAE decoder and UNet up-blocks follow every 2x nearest upsample with a
3x3 conv (diffusers ``Upsample2D``; reference uses it inside
``vae.decode``/UNet — ``sdxl_turbo_with_logprob.py:152-157``). Computing
the conv on the upsampled grid wastes work: nearest-neighbour duplication
makes neighbouring taps hit the same source pixel, so the 3x3 kernel
collapses, per output-pixel parity, to a 2x2 kernel on the COARSE grid:

  output row 2i+a reads coarse rows [i-1, i] (a=0, taps [K0, K1+K2]) or
  [i, i+1] (a=1, taps [K0+K1, K2]); same along columns.

That is 4 * (2*2) = 16 MACs per coarse pixel instead of 4 * (3*3) = 36 —
2.25x fewer FLOPs — and the conv reads the coarse tensor instead of the
4x-materialized upsampled one. Measured on v5e (batch 8, bf16):
64->128 c512 4.74 -> 3.52 ms; 128->256 c512 15.4 -> 12.1 ms;
256->512 c256 16.9 -> 15.4 ms (scripts/microbench_vae.py).

The module-level win does NOT compose in the full 512^2 decoder: the
depth-to-space interleave after the 4o-channel conv breaks XLA's
conv->norm fusion and the end-to-end headline measures ~5% slower
(BENCHMARKS.md matrix) — so dispatch defaults to the naive path; the
rewrite stays behind ``set_use_subpixel`` / ``kernels.subpixel_upsample``.

Numerics: the collapsed taps (e.g. K1+K2) are summed in fp32. Versus the
naive path this reorders one addition from the MXU accumulator into the
kernel — exact in fp32, within 1 ulp of the weights in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")
_USE_SUBPIXEL = False


def set_use_subpixel(flag: bool) -> None:
    """Global dispatch for upsample+conv (True = subpixel rewrite)."""
    global _USE_SUBPIXEL
    _USE_SUBPIXEL = flag


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (B,2H,2W,C) nearest. Broadcast+reshape: pure layout
    movement (jax.image.resize(nearest) lowers to a slow gather on TPU)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def _subpixel_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3,3,C,O) -> (2,2,C,4,O) collapsed kernels, parity-major (a,b)."""
    kf = kernel.astype(jnp.float32)
    rows = {
        0: jnp.stack([kf[0], kf[1] + kf[2]], 0),  # (2,3,C,O): taps over [i-1, i]
        1: jnp.stack([kf[0] + kf[1], kf[2]], 0),  # taps over [i, i+1]
    }

    def cols(r2, b):
        if b == 0:
            return jnp.stack([r2[:, 0], r2[:, 1] + r2[:, 2]], 1)  # (2,2,C,O)
        return jnp.stack([r2[:, 0] + r2[:, 1], r2[:, 2]], 1)

    parts = [cols(rows[a], b) for a in (0, 1) for b in (0, 1)]
    return jnp.stack(parts, axis=3).astype(kernel.dtype)  # (2,2,C,4,O)


def upsample2x_conv3x3(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    allow_int8: bool = False,
) -> jnp.ndarray:
    """nearest-2x upsample then 3x3 same-pad conv; x (B,H,W,C),
    kernel (3,3,C,O) HWIO, bias (O,). Dispatches to the subpixel rewrite
    unless disabled via ``set_use_subpixel(False)``; the naive path may
    run dynamic-int8 (``ops.qconv``, VAE decoder sites only)."""
    if not _USE_SUBPIXEL:
        from .qconv import decoder_conv2d

        return decoder_conv2d(
            nearest_upsample_2x(x), kernel, bias, allow_int8=allow_int8
        )

    b, h, w, c = x.shape
    o = kernel.shape[-1]
    k4 = _subpixel_kernel(kernel).reshape(2, 2, c, 4 * o)
    y = lax.conv_general_dilated(
        x, k4, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN
    )  # (b, h+1, w+1, 4o): window [i-1+u, j-1+v] for u,v in {0,1}
    y = y.reshape(b, h + 1, w + 1, 2, 2, o)
    # parity (a,bp): output pixel (2i+a, 2j+bp) = y[i+a, j+bp, a, bp]
    p00 = y[:, :h, :w, 0, 0]
    p01 = y[:, :h, 1:, 0, 1]
    p10 = y[:, 1:, :w, 1, 0]
    p11 = y[:, 1:, 1:, 1, 1]
    top = jnp.stack([p00, p01], 3)  # (b,h,w,2,o): column interleave, a=0
    bot = jnp.stack([p10, p11], 3)
    out = jnp.stack([top, bot], 2).reshape(b, 2 * h, 2 * w, o)
    return out if bias is None else out + bias.astype(out.dtype)

"""Dynamic-int8 2D convolution for the VAE decoder (opt-in).

The decoder's 3x3 convs are the headline bench's ceiling-setter (62% of
step time, ~63% of bf16 MXU peak — BENCHMARKS.md); the v5e MXU runs
int8 at 2x the bf16 rate (microbenched 178-190 TOP/s vs 133 TF/s on
these shapes, scripts/microbench_vae.py). This path quantizes per-call:

- activations per-SAMPLE symmetric (dynamic max over H,W,C) — decode
  batches interleave two trajectories whose ranges differ, and the
  per-sample grid is free (same reduction read as the per-tensor max);
- weights per-output-channel symmetric;
- int32 accumulation, dequantize into the bias add;
- OPT-IN SmoothQuant-style outlier migration (Xiao et al., arXiv
  2211.10438) via ``set_int8_smooth_alpha``: each input channel's
  activation range is equalized into the weights before quantization —
  ``conv(x/m_c, W*m_c) == conv(x, W)`` exactly for a per-input-channel
  scale, so only the quantization grids change. Default OFF by
  measurement: the extra per-channel activation reduction does not fuse
  with the per-sample max (different reduce axes) and costs ~6% of the
  int8 headline, while at random weights the ranking fidelity does not
  measurably improve (BENCHMARKS.md). Real checkpoints make decoder
  activations channel-heteroscedastic through the GroupNorm affine —
  turn it on there.

It remains an accuracy/throughput TRADE and is OFF by default — enable
via ``kernels.int8_vae_decode`` / ``set_use_int8_decode`` for
throughput-oriented sampling; never used in the UNet or the scorers.
Image-level qualification numbers: BENCHMARKS.md ("Known headroom").
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")
_USE_INT8_DECODE = False
_SMOOTH_ALPHA: float | None = None  # opt-in outlier migration (see above)
_REF_PASS_INT8 = False  # trace-time scope flag (int8_ref_pass below)


def set_use_int8_decode(flag: bool) -> None:
    global _USE_INT8_DECODE
    _USE_INT8_DECODE = flag


def use_int8_decode() -> bool:
    return _USE_INT8_DECODE


_USE_INT8_SCORER = False


def set_use_int8_scorer(flag: bool) -> None:
    """Trace-time global: dynamic-int8 MLP matmuls in CLIP VISION towers
    (the scorer image tower — ~7-9% of the headline iteration). Text
    towers and the SDXL TEs are untouched. Qualification:
    scripts/qualify_int8_scorer.py; A/B: PSO_INT8_SCORER=1 bench.py."""
    global _USE_INT8_SCORER
    _USE_INT8_SCORER = flag


def use_int8_scorer() -> bool:
    return _USE_INT8_SCORER


def set_int8_smooth_alpha(alpha: float | None) -> None:
    """Migration strength for the dispatched int8 path (None = off)."""
    global _SMOOTH_ALPHA
    _SMOOTH_ALPHA = alpha


@contextlib.contextmanager
def int8_ref_pass(enabled: bool = True):
    """Trace-time scope: while active, the UNet's weight matmuls
    (transformer projections, GEGLU FF, attention q/k/v/out bases) and
    resnet 3x3 convs route through dynamic int8.

    Intended ONLY around the grad-free frozen-reference forward of the
    DPO update (``train.online_pso`` wraps the unfused ``lora_scale=0``
    apply; reference cost context: 2 of the 4 UNet passes/microbatch,
    ``train_online_pso_sdxl_turbo.py:775-805``). The pass is
    quantization-tolerant by the same argument as the int8 VAE decode:
    its output only enters the loss through the reference log-prob, and
    the v5e MXU runs int8 at ~2x the bf16 rate. The flag is read at
    TRACE time — scope it around the apply inside the jitted function.
    """
    global _REF_PASS_INT8
    prev = _REF_PASS_INT8
    _REF_PASS_INT8 = bool(enabled)
    try:
        yield
    finally:
        _REF_PASS_INT8 = prev


def in_int8_ref_pass() -> bool:
    return _REF_PASS_INT8


def int8_matmul(
    x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Dynamic-int8 matmul: x (..., C) @ w (C, O).

    Activations per-TOKEN symmetric (max over the contracted dim — the
    finest grid whose reduction fuses with the quantize), weights
    per-output-column symmetric, int32 accumulation, dequantize into the
    bias add. Exact on integer-representable inputs (see tests)."""
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-8) / 127.0
    s_w = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0  # (O,)
    xq = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
    wq = jnp.clip(jnp.round(wf / s_w), -127, 127).astype(jnp.int8)
    acc = lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def int8_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: tuple = ((1, 1), (1, 1)),
    smooth_alpha: float | None = None,
) -> jnp.ndarray:
    """Dynamic-int8 conv: x (B,H,W,C), kernel (kh,kw,C,O) HWIO.

    y = conv(q(x/m), q(W*m)) * (s_x[b] * s_w[o]) + bias, int32
    accumulation. ``smooth_alpha`` balances the outlier migration
    (0 = all spread stays in activations, 1 = all moved to weights);
    ``None`` disables migration (the per-tensor/per-channel grids are
    then exact on integer-representable inputs — see tests).
    """
    xf = x.astype(jnp.float32)
    kf = kernel.astype(jnp.float32)
    if smooth_alpha is not None:
        a_c = jnp.max(jnp.abs(xf), axis=(0, 1, 2))  # (C,) activation range
        w_c = jnp.max(jnp.abs(kf), axis=(0, 1, 3))  # (C,) weight range
        m = jnp.power(jnp.maximum(a_c, 1e-8), smooth_alpha) * jnp.power(
            jnp.maximum(w_c, 1e-8), smooth_alpha - 1.0
        )
        # channels the activations never use keep m=1 (avoid inflating
        # the weight grid for a channel that contributes nothing)
        m = jnp.where(a_c > 0, m, 1.0)
        xf = xf / m
        kf = kf * m[None, None, :, None]
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3)), 1e-8) / 127.0  # (B,)
    s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)), 1e-8) / 127.0  # (O,)
    xq = jnp.clip(jnp.round(xf / s_x[:, None, None, None]), -127, 127).astype(
        jnp.int8
    )
    wq = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq, wq, (stride, stride), padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x[:, None, None, None] * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def decoder_conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: tuple = ((1, 1), (1, 1)),
    allow_int8: bool = False,
) -> jnp.ndarray:
    """Conv dispatch for resnet 3x3 convs: int8 when the VAE-decode knob
    is on AND the call site allows it, or inside an ``int8_ref_pass``
    scope (UNet frozen-reference forward); plain conv otherwise.
    SmoothQuant migration stays a decode-only option — the ref pass uses
    the plain per-sample/per-channel grids."""
    if allow_int8 and _USE_INT8_DECODE:
        return int8_conv2d(x, kernel, bias, stride, padding,
                           smooth_alpha=_SMOOTH_ALPHA)
    if _REF_PASS_INT8:
        return int8_conv2d(x, kernel, bias, stride, padding)
    y = lax.conv_general_dilated(
        x, kernel, (stride, stride), padding, dimension_numbers=_DN
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y

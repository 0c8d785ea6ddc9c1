"""In-graph CLIP image preprocessing.

The reference round-trips every sampled image through the host
(uint8 numpy -> PIL -> HF processor -> back to GPU; reference
``train_online_pso_sdxl_turbo.py:632-640``). Here decode output stays in
HBM: resize + normalize are part of the jitted reward program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# OpenAI-CLIP normalization constants (all CLIP variants in the system)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_preprocess(
    images: jnp.ndarray,
    size: int = 224,
    method: str = "bicubic",
    value_range: tuple[float, float] = (-1.0, 1.0),
) -> jnp.ndarray:
    """(B, H, W, 3) images -> (B, size, size, 3) CLIP-normalized.

    ``value_range`` describes the input encoding; VAE decodes land in
    [-1, 1], PIL-derived arrays in [0, 1].
    """
    lo, hi = value_range
    x = (images.astype(jnp.float32) - lo) / (hi - lo)  # -> [0, 1]
    x = jnp.clip(x, 0.0, 1.0)
    b, h, w, c = x.shape
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method=method)
        x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std


def clip_preprocess_max_size(
    images: jnp.ndarray,
    size: int = 224,
    method: str = "bicubic",
    value_range: tuple[float, float] = (-1.0, 1.0),
) -> jnp.ndarray:
    """open_clip ``ResizeMaxSize`` eval transform, in-graph.

    Resize the LONGEST side to ``size`` (aspect preserved) and center-pad
    the rest with black (fill 0 in [0,1] space) — the fork's
    ``light_augmentation`` transform used by the reference CLIP scorer
    (``clip_utils.py:18-37``, open_clip ``transform.py`` ``ResizeMaxSize``,
    ``factory.py:368-376``). Identical to ``clip_preprocess`` for square
    inputs; divergent only for non-square images. Shapes are static under
    jit, so the scale math is trace-time Python.
    """
    lo, hi = value_range
    x = (images.astype(jnp.float32) - lo) / (hi - lo)
    x = jnp.clip(x, 0.0, 1.0)
    b, h, w, c = x.shape
    scale = size / float(max(h, w))
    new_h, new_w = round(h * scale), round(w * scale)
    if scale != 1.0:
        x = jax.image.resize(x, (b, new_h, new_w, c), method=method)
        x = jnp.clip(x, 0.0, 1.0)
    if (new_h, new_w) != (size, size):
        # open_clip skips this pad when scale == 1.0 exactly (its torch
        # model then faults on the non-square tensor); padding always is
        # the behavior every working open_clip path produces
        pad_h, pad_w = size - new_h, size - new_w
        x = jnp.pad(
            x,
            (
                (0, 0),
                (pad_h // 2, pad_h - pad_h // 2),
                (pad_w // 2, pad_w - pad_w // 2),
                (0, 0),
            ),
        )
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std

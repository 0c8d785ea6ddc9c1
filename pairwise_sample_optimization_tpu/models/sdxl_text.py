"""SDXL dual text encoding (parity with reference ``encode_prompt``).

Reference semantics (``train_online_pso_sdxl_turbo.py:96-118``): each
encoder contributes its penultimate hidden state (``hidden_states[-2]``),
concatenated on the feature axis (768 + 1280 = 2048); the pooled vector
is ALWAYS the final (second) encoder's projected pooled output (1280).

``compute_time_ids`` packs (original_size, crop_top_left, target_size)
into the six SDXL micro-conditioning ids (``:324-332``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .clip import CLIPTextTower


def encode_sdxl_prompt(
    te1: CLIPTextTower,
    te1_vars,
    te2: CLIPTextTower,
    te2_vars,
    input_ids_one: jnp.ndarray,
    input_ids_two: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (prompt_embeds (B, 77, 2048), pooled_prompt_embeds (B, 1280))."""
    out1 = te1.apply(te1_vars, input_ids_one)
    out2 = te2.apply(te2_vars, input_ids_two)
    prompt_embeds = jnp.concatenate(
        [out1["penultimate"], out2["penultimate"]], axis=-1
    )
    pooled = out2["projected"]
    if pooled is None:
        raise ValueError("text encoder 2 must have a projection head")
    return prompt_embeds, pooled


def compute_time_ids(
    batch: int,
    original_size: int = 512,
    crops_coords_top_left: int = 0,
    target_size: int | None = None,
) -> jnp.ndarray:
    """(B, 6) add_time_ids = (orig_h, orig_w, crop_top, crop_left, tgt_h, tgt_w)."""
    target_size = target_size if target_size is not None else original_size
    row = jnp.asarray(
        [
            original_size,
            original_size,
            crops_coords_top_left,
            crops_coords_top_left,
            target_size,
            target_size,
        ],
        jnp.float32,
    )
    return jnp.tile(row[None], (batch, 1))


def time_ids_from_records(original_sizes, crop_top_lefts, target_size: int):
    """(N, 6) per-image add_time_ids from dataset records.

    ``original_sizes``/``crop_top_lefts`` are sequences of (h, w)/(top,
    left) — the SDXL micro-conditioning a DreamBooth dataset records per
    augmentation view (reference ``train_pso_sdxl_turbo_dreambooth.py``
    collate; the per-image coordinates are what lets SDXL avoid
    crop/framing artifacts)."""
    import numpy as np

    rows = np.asarray(
        [
            (oh, ow, ct, cl, target_size, target_size)
            for (oh, ow), (ct, cl) in zip(original_sizes, crop_top_lefts)
        ],
        np.float32,
    )
    return jnp.asarray(rows)

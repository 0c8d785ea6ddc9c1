"""Port CLIP dual-encoder state dicts into the scorer tree.

Two wire formats feed the CLIP-H scorers:

- HF ``CLIPModel`` dicts (``text_model.* / vision_model.* /
  text_projection / visual_projection / logit_scale``) — PickScore_v1
  and laion CLIP-H ship this way;
- **open_clip**-format dicts (``visual.* / transformer.resblocks.* /
  token_embedding / positional_embedding / ln_final / text_projection``,
  fused ``attn.in_proj_*``, raw ``x @ proj`` projection parameters,
  usually wrapped under a ``state_dict`` key) — ``HPS_v2_compressed.pt``
  ships this way (reference ``hps_utils.py:64-71`` loads it into the
  vendored open_clip ViT-H-14).

``load_hf_clip_dual`` detects the format and converts open_clip dicts to
the HF layout first (splitting the fused qkv, transposing the raw
projection matrices into Linear layout), then reuses the per-tower name
maps that are anchored against real ``transformers`` models.
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from .convert import load_torch_state_dict, torch_to_flax
from .torch_names import clip_text_param_map, clip_vision_param_map


def _convert_block(sd, out, src: str, dst: str) -> None:
    """One transformer resblock: open_clip -> HF CLIPEncoderLayer keys."""
    out[f"{dst}.layer_norm1.weight"] = sd[f"{src}.ln_1.weight"]
    out[f"{dst}.layer_norm1.bias"] = sd[f"{src}.ln_1.bias"]
    out[f"{dst}.layer_norm2.weight"] = sd[f"{src}.ln_2.weight"]
    out[f"{dst}.layer_norm2.bias"] = sd[f"{src}.ln_2.bias"]
    # fused qkv -> separate projections (rows are [q | k | v])
    w = np.asarray(sd[f"{src}.attn.in_proj_weight"])
    b = np.asarray(sd[f"{src}.attn.in_proj_bias"])
    d = w.shape[0] // 3
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[f"{dst}.self_attn.{name}.weight"] = w[i * d : (i + 1) * d]
        out[f"{dst}.self_attn.{name}.bias"] = b[i * d : (i + 1) * d]
    out[f"{dst}.self_attn.out_proj.weight"] = sd[f"{src}.attn.out_proj.weight"]
    out[f"{dst}.self_attn.out_proj.bias"] = sd[f"{src}.attn.out_proj.bias"]
    out[f"{dst}.mlp.fc1.weight"] = sd[f"{src}.mlp.c_fc.weight"]
    out[f"{dst}.mlp.fc1.bias"] = sd[f"{src}.mlp.c_fc.bias"]
    out[f"{dst}.mlp.fc2.weight"] = sd[f"{src}.mlp.c_proj.weight"]
    out[f"{dst}.mlp.fc2.bias"] = sd[f"{src}.mlp.c_proj.bias"]


def is_openclip_format(sd) -> bool:
    return "visual.conv1.weight" in sd or "visual.class_embedding" in sd


def openclip_to_hf_clip(sd) -> dict:
    """open_clip CLIP state dict -> HF ``CLIPModel`` layout.

    Raw-parameter projections (used as ``x @ P``) transpose into Linear
    ``weight`` layout (``P.T``); the fused ``in_proj`` splits into
    q/k/v; embeddings/norms rename 1:1.
    """
    out = {}
    out["logit_scale"] = sd["logit_scale"]
    # ---- text tower (top-level keys in the classic CLIP class) ----
    out["text_model.embeddings.token_embedding.weight"] = sd[
        "token_embedding.weight"
    ]
    out["text_model.embeddings.position_embedding.weight"] = sd[
        "positional_embedding"
    ]
    out["text_model.final_layer_norm.weight"] = sd["ln_final.weight"]
    out["text_model.final_layer_norm.bias"] = sd["ln_final.bias"]
    out["text_projection.weight"] = np.ascontiguousarray(
        np.asarray(sd["text_projection"]).T
    )
    # ---- vision tower ----
    out["vision_model.embeddings.patch_embedding.weight"] = sd[
        "visual.conv1.weight"
    ]
    out["vision_model.embeddings.class_embedding"] = sd["visual.class_embedding"]
    out["vision_model.embeddings.position_embedding.weight"] = sd[
        "visual.positional_embedding"
    ]
    out["vision_model.pre_layrnorm.weight"] = sd["visual.ln_pre.weight"]
    out["vision_model.pre_layrnorm.bias"] = sd["visual.ln_pre.bias"]
    out["vision_model.post_layernorm.weight"] = sd["visual.ln_post.weight"]
    out["vision_model.post_layernorm.bias"] = sd["visual.ln_post.bias"]
    out["visual_projection.weight"] = np.ascontiguousarray(
        np.asarray(sd["visual.proj"]).T
    )
    for key in sd:
        m = re.fullmatch(r"transformer\.resblocks\.(\d+)\.ln_1\.weight", key)
        if m:
            i = m.group(1)
            _convert_block(
                sd, out,
                f"transformer.resblocks.{i}",
                f"text_model.encoder.layers.{i}",
            )
        m = re.fullmatch(
            r"visual\.transformer\.resblocks\.(\d+)\.ln_1\.weight", key
        )
        if m:
            i = m.group(1)
            _convert_block(
                sd, out,
                f"visual.transformer.resblocks.{i}",
                f"vision_model.encoder.layers.{i}",
            )
    return out


def load_hf_clip_dual(path_or_sd, abstract_variables, dtype=None):
    """-> variables for ``CLIPDualEncoder`` ({'params': {text, vision,
    logit_scale}}). Accepts an HF ``CLIPModel`` or open_clip-format state
    dict, a weight-file path, or an HF snapshot dir."""
    sd = (
        load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else dict(path_or_sd)
    )
    if is_openclip_format(sd):
        sd = openclip_to_hf_clip(sd)
    params = abstract_variables["params"]
    text, _ = torch_to_flax(sd, params["text"], clip_text_param_map, dtype=dtype)
    vision, _ = torch_to_flax(sd, params["vision"], clip_vision_param_map, dtype=dtype)
    logit_scale = jnp.asarray(np.asarray(sd["logit_scale"]).reshape(()), jnp.float32)
    return {"params": {"text": text, "vision": vision, "logit_scale": logit_scale}}

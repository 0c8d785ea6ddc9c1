"""Port an HF CLIPModel state dict into the dual-encoder scorer tree.

PickScore_v1 / laion CLIP-H / HPS_v2 all ship as one HF ``CLIPModel``
state dict (``text_model.* / vision_model.* / text_projection /
visual_projection / logit_scale``). The dual encoder's flax tree nests
the towers under ``text`` / ``vision``; this adapter splits the dict and
reuses the per-tower name maps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .convert import load_torch_state_dict, torch_to_flax
from .torch_names import clip_text_param_map, clip_vision_param_map


def load_hf_clip_dual(path_or_sd, abstract_variables, dtype=None):
    """-> variables for ``CLIPDualEncoder`` ({'params': {text, vision,
    logit_scale}})."""
    sd = (
        load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else dict(path_or_sd)
    )
    params = abstract_variables["params"]
    text, _ = torch_to_flax(sd, params["text"], clip_text_param_map, dtype=dtype)
    vision, _ = torch_to_flax(sd, params["vision"], clip_vision_param_map, dtype=dtype)
    logit_scale = jnp.asarray(np.asarray(sd["logit_scale"]).reshape(()), jnp.float32)
    return {"params": {"text": text, "vision": vision, "logit_scale": logit_scale}}

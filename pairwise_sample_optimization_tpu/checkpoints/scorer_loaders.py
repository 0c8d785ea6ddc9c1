"""Weight-port loaders for the non-CLIP reward/eval scorers.

Closes the round-2 gap: the aesthetic MLP, ImageReward and HPS scorers
had correct architectures but no way to consume their released
checkpoints. Formats:

- LAION aesthetic predictor: a bare ``nn.Sequential`` state dict
  (``layers.{0,2,4,6,7}.{weight,bias}``) in
  ``sac+logos+ava1-l14-linearMSE.pth`` (reference
  ``aesthetic_scorer.py:32-38``) + an HF ``CLIPModel``
  (openai/clip-vit-large-patch14) for the image tower;
- ImageReward-v1.0: one ``.pt`` with ``blip.visual_encoder.*``
  (timm-layout ViT-L/16), ``blip.text_encoder.*`` (BLIP "med" BertModel
  with per-layer cross-attention) and ``mlp.layers.*`` (the same
  Sequential MLP shape) — reference consumes it via the ``image-reward``
  package (``evaluate_sdxl_dmd2.py:43,234``);
- HPS_v2: an open_clip-format CLIP dict handled by
  ``clip_loader.load_hf_clip_dual`` (format auto-detected).
"""

from __future__ import annotations

import numpy as np

from .convert import load_torch_state_dict, torch_to_flax
from .torch_names import (
    blip_bert_param_map,
    blip_vit_param_map,
    clip_vision_param_map,
    sequential_mlp_param_map,
)


def load_aesthetic_mlp(path_or_sd, abstract_variables):
    """``sac+logos+ava1-l14-linearMSE.pth`` -> AestheticMLP variables."""
    sd = (
        load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else dict(path_or_sd)
    )
    params, _ = torch_to_flax(
        sd, abstract_variables["params"], sequential_mlp_param_map
    )
    return {"params": params}


def load_clip_vision(path_or_sd, abstract_variables, dtype=None):
    """HF ``CLIPModel``/``CLIPVisionModelWithProjection`` dict -> the
    ``CLIPVisionTower`` variables (the aesthetic scorer's CLIP-L image
    tower, reference ``aesthetic_scorer.py:35,47``)."""
    sd = (
        load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else dict(path_or_sd)
    )
    params, _ = torch_to_flax(
        sd, abstract_variables["params"], clip_vision_param_map, dtype=dtype
    )
    return {"params": params}


def _subdict(sd, prefix: str) -> dict:
    n = len(prefix)
    return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}


def load_imagereward(path_or_sd, vit_abstract, bert_abstract, mlp_abstract,
                     dtype=None):
    """ImageReward-v1.0 checkpoint -> (vit, bert, mlp) variable trees.

    Folds ``token_type_embeddings`` row 0 into the position embeddings
    (text token-type ids are constant 0; the sum is LayerNormed, so this
    is exact) — see ``torch_names.blip_bert_param_map``.
    """
    sd = (
        load_torch_state_dict(path_or_sd)
        if isinstance(path_or_sd, str)
        else dict(path_or_sd)
    )
    vit_sd = _subdict(sd, "blip.visual_encoder.")
    bert_sd = _subdict(sd, "blip.text_encoder.")
    # BLIP wraps the BertModel: keys may carry a ``bert.`` level
    if not any(k.startswith("embeddings.") for k in bert_sd):
        bert_sd = _subdict(bert_sd, "bert.")
    mlp_sd = _subdict(sd, "mlp.")

    bert_sd = dict(bert_sd)
    tt = np.asarray(bert_sd.pop("embeddings.token_type_embeddings.weight"))
    pos = np.asarray(bert_sd["embeddings.position_embeddings.weight"])
    bert_sd["embeddings.position_embeddings.weight"] = pos + tt[0][None, :]

    vit, _ = torch_to_flax(
        vit_sd, vit_abstract["params"], blip_vit_param_map, dtype=dtype
    )
    bert, _ = torch_to_flax(
        bert_sd, bert_abstract["params"], blip_bert_param_map, dtype=dtype
    )
    mlp, _ = torch_to_flax(mlp_sd, mlp_abstract["params"], sequential_mlp_param_map)
    return {"params": vit}, {"params": bert}, {"params": mlp}

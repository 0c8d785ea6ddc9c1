"""Flax <-> diffusers/HF-torch parameter-name translation.

Pure path math: every flax param path in this framework's models
translates deterministically to the corresponding diffusers
``UNet2DConditionModel`` / ``AutoencoderKL`` / HF ``CLIPModel`` state-dict
key. This is the basis of the one-time torch->flax weight port and of the
diffusers-layout LoRA interop (the reference reads/writes
``pytorch_lora_weights.safetensors`` via
``StableDiffusionXLLoraLoaderMixin``,
``train_online_pso_sdxl_turbo.py:361-398``).

Transforms per tensor kind:
- ``linear``: torch (out, in) -> flax (in, out) transpose
- ``conv``:   torch (out, in, kh, kw) -> flax (kh, kw, in, out)
- ``direct``: norms, biases, embeddings, scalars — unchanged
"""

from __future__ import annotations

import re
from typing import Tuple

Kind = str  # "linear" | "conv" | "direct"


def _unet_module(path0: str, n_levels: int) -> str:
    m = re.fullmatch(r"down_(\d+)_resnet_(\d+)", path0)
    if m:
        return f"down_blocks.{m.group(1)}.resnets.{m.group(2)}"
    m = re.fullmatch(r"down_(\d+)_attn_(\d+)", path0)
    if m:
        return f"down_blocks.{m.group(1)}.attentions.{m.group(2)}"
    m = re.fullmatch(r"down_(\d+)_downsample", path0)
    if m:
        return f"down_blocks.{m.group(1)}.downsamplers.0"
    m = re.fullmatch(r"up_(\d+)_resnet_(\d+)", path0)
    if m:
        return f"up_blocks.{n_levels - 1 - int(m.group(1))}.resnets.{m.group(2)}"
    m = re.fullmatch(r"up_(\d+)_attn_(\d+)", path0)
    if m:
        return f"up_blocks.{n_levels - 1 - int(m.group(1))}.attentions.{m.group(2)}"
    m = re.fullmatch(r"up_(\d+)_upsample", path0)
    if m:
        return f"up_blocks.{n_levels - 1 - int(m.group(1))}.upsamplers.0"
    m = re.fullmatch(r"mid_resnet_(\d+)", path0)
    if m:
        return f"mid_block.resnets.{m.group(1)}"
    if path0 == "mid_attn":
        return "mid_block.attentions.0"
    # conv_in / conv_out / conv_norm_out / time_embedding / add_embedding
    return path0


def _leaf(leaf: str, parent: str) -> Tuple[str, Kind]:
    """Map a flax leaf name to (torch suffix, kind placeholder)."""
    if leaf == "kernel":
        return "weight", "?"  # linear vs conv resolved by ndim
    if leaf == "scale":
        return "weight", "direct"
    if leaf == "bias":
        return "bias", "direct"
    if leaf == "embedding":
        return "weight", "direct"
    raise KeyError(f"unknown leaf {leaf!r} under {parent!r}")


def _inner(parts: Tuple[str, ...]) -> str:
    """Translate intra-module path segments (transformer internals etc.)."""
    out = []
    for p in parts:
        m = re.fullmatch(r"block_(\d+)", p)
        if m:
            out.append(f"transformer_blocks.{m.group(1)}")
        elif p == "to_out":
            out.append("to_out.0")
        else:
            out.append(p)
    s = ".".join(out)
    # GEGLU feed-forward naming
    s = s.replace("ff.proj_in", "ff.net.0.proj").replace("ff.proj_out", "ff.net.2")
    return s


def unet_param_map(path: Tuple[str, ...], n_levels: int = 3) -> Tuple[str, Kind]:
    """flax params path -> (diffusers UNet key, kind)."""
    *mods, leaf = path
    mods = list(mods)
    head = _unet_module(mods[0], n_levels)
    rest = _inner(tuple(mods[1:]))
    suffix, kind = _leaf(leaf, path[-2] if len(path) > 1 else "")
    key = ".".join(x for x in (head, rest) if x) + "." + suffix
    return key, kind


def _vae_block(path0: str, n_levels: int) -> str:
    m = re.fullmatch(r"down_(\d+)_resnet_(\d+)", path0)
    if m:
        return f"down_blocks.{m.group(1)}.resnets.{m.group(2)}"
    m = re.fullmatch(r"down_(\d+)_downsample", path0)
    if m:
        return f"down_blocks.{m.group(1)}.downsamplers.0"
    m = re.fullmatch(r"up_(\d+)_resnet_(\d+)", path0)
    if m:
        return f"up_blocks.{m.group(1)}.resnets.{m.group(2)}"
    m = re.fullmatch(r"up_(\d+)_upsample", path0)
    if m:
        return f"up_blocks.{m.group(1)}.upsamplers.0"
    m = re.fullmatch(r"mid_resnet_(\d+)", path0)
    if m:
        return f"mid_block.resnets.{m.group(1)}"
    if path0 == "mid_attn":
        return "mid_block.attentions.0"
    return path0


def vae_param_map(path: Tuple[str, ...], n_levels: int = 4) -> Tuple[str, Kind]:
    """flax AutoencoderKL path -> (diffusers VAE key, kind)."""
    *mods, leaf = path
    if mods[0] in ("quant_conv", "post_quant_conv"):
        head = mods[0]
        rest = _inner(tuple(mods[1:]))
    else:
        tower = mods[0]  # encoder | decoder
        head = tower + "." + _vae_block(mods[1], n_levels)
        rest = _inner(tuple(mods[2:]))
    suffix, kind = _leaf(leaf, path[-2] if len(path) > 1 else "")
    key = ".".join(x for x in (head, rest) if x) + "." + suffix
    return key, kind


_CLIP_TEXT = {
    "token_embedding": "text_model.embeddings.token_embedding",
    "final_norm": "text_model.final_layer_norm",
    "text_projection": "text_projection",
}


def clip_text_param_map(path: Tuple[str, ...]) -> Tuple[str, Kind]:
    """flax CLIPTextTower path -> HF CLIPTextModel(WithProjection) key."""
    if path == ("position_embedding",):
        return "text_model.embeddings.position_embedding.weight", "direct"
    *mods, leaf = path
    m = re.fullmatch(r"layer_(\d+)", mods[0])
    if m:
        head = f"text_model.encoder.layers.{m.group(1)}"
        inner = {
            "norm1": "layer_norm1",
            "norm2": "layer_norm2",
            "q_proj": "self_attn.q_proj",
            "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj",
            "out_proj": "self_attn.out_proj",
            "fc1": "mlp.fc1",
            "fc2": "mlp.fc2",
        }[mods[1]]
        head = head + "." + inner
    else:
        head = _CLIP_TEXT[mods[0]]
    suffix, kind = _leaf(leaf, mods[-1])
    return head + "." + suffix, kind


def sequential_mlp_param_map(path: Tuple[str, ...]) -> Tuple[str, Kind]:
    """flax ``fc{i}`` (5-layer scorer MLP) -> torch ``nn.Sequential``
    indices ``layers.{0,2,4,6,7}`` (Linear/Dropout interleave of the LAION
    aesthetic predictor, reference ``aesthetic_scorer.py:13-29``, and of
    ImageReward's identical head)."""
    mod, leaf = path
    m = re.fullmatch(r"fc(\d)", mod)
    if not m:
        raise KeyError(f"unexpected MLP module {mod!r}")
    seq_idx = (0, 2, 4, 6, 7)[int(m.group(1))]
    suffix, kind = _leaf(leaf, mod)
    return f"layers.{seq_idx}.{suffix}", kind


def blip_vit_param_map(path: Tuple[str, ...]) -> Tuple[str, Kind]:
    """flax ``models.vit.ViT`` path -> BLIP/timm VisionTransformer key
    (ImageReward's ``blip.visual_encoder``; timm layout:
    ``patch_embed.proj / cls_token / pos_embed / blocks.{i}.(norm1,
    attn.qkv, attn.proj, norm2, mlp.fc1, mlp.fc2) / norm``)."""
    if path == ("class_embedding",):
        return "cls_token", "squeeze"  # (1,1,W) -> (W,)
    if path == ("position_embedding",):
        return "pos_embed", "squeeze"  # (1,S,W) -> (S,W)
    *mods, leaf = path
    suffix, kind = _leaf(leaf, mods[-1])
    if mods[0] == "patch_embedding":
        return f"patch_embed.proj.{suffix}", kind
    if mods[0] == "final_norm":
        return f"norm.{suffix}", kind
    m = re.fullmatch(r"block_(\d+)", mods[0])
    if m:
        inner = {
            "norm1": "norm1",
            "qkv": "attn.qkv",
            "proj": "attn.proj",
            "norm2": "norm2",
            "fc1": "mlp.fc1",
            "fc2": "mlp.fc2",
        }[mods[1]]
        return f"blocks.{m.group(1)}.{inner}.{suffix}", kind
    raise KeyError(f"unknown ViT module {mods[0]!r}")


def blip_bert_param_map(path: Tuple[str, ...]) -> Tuple[str, Kind]:
    """flax ``models.bert.BertEncoder`` path -> BLIP "med" BertModel key
    (HF BERT layout + per-layer ``crossattention``; ImageReward's
    ``blip.text_encoder``). ``token_type_embeddings`` have no flax leaf:
    text token-type ids are constant 0, so the loader folds row 0 into
    ``position_embeddings`` before this map runs (exact — the embedding
    sum is LayerNormed afterwards)."""
    if path == ("position_embeddings",):
        return "embeddings.position_embeddings.weight", "direct"
    *mods, leaf = path
    suffix, kind = _leaf(leaf, mods[-1])
    if mods[0] == "word_embeddings":
        return "embeddings.word_embeddings.weight", "direct"
    if mods[0] == "embeddings_norm":
        return f"embeddings.LayerNorm.{suffix}", kind
    m = re.fullmatch(r"layer_(\d+)", mods[0])
    if m:
        head = f"encoder.layer.{m.group(1)}"
        if mods[1] in ("attention", "crossattention"):
            sub = {
                "query": "self.query",
                "key": "self.key",
                "value": "self.value",
                "output": "output.dense",
            }[mods[2]]
            return f"{head}.{mods[1]}.{sub}.{suffix}", kind
        inner = {
            "attn_norm": "attention.output.LayerNorm",
            "cross_norm": "crossattention.output.LayerNorm",
            "intermediate": "intermediate.dense",
            "ffn_out": "output.dense",
            "ffn_norm": "output.LayerNorm",
        }[mods[1]]
        return f"{head}.{inner}.{suffix}", kind
    raise KeyError(f"unknown BERT module {mods[0]!r}")


_CLIP_VISION = {
    "patch_embedding": "vision_model.embeddings.patch_embedding",
    "pre_norm": "vision_model.pre_layrnorm",  # (sic) HF key
    "post_norm": "vision_model.post_layernorm",
    "visual_projection": "visual_projection",
}


def clip_vision_param_map(path: Tuple[str, ...]) -> Tuple[str, Kind]:
    """flax CLIPVisionTower path -> HF CLIPVisionModel key."""
    if path == ("class_embedding",):
        return "vision_model.embeddings.class_embedding", "direct"
    if path == ("position_embedding",):
        return "vision_model.embeddings.position_embedding.weight", "direct"
    *mods, leaf = path
    m = re.fullmatch(r"layer_(\d+)", mods[0])
    if m:
        inner = {
            "norm1": "layer_norm1",
            "norm2": "layer_norm2",
            "q_proj": "self_attn.q_proj",
            "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj",
            "out_proj": "self_attn.out_proj",
            "fc1": "mlp.fc1",
            "fc2": "mlp.fc2",
        }[mods[1]]
        head = f"vision_model.encoder.layers.{m.group(1)}." + inner
    else:
        head = _CLIP_VISION[mods[0]]
    suffix, kind = _leaf(leaf, mods[-1])
    return head + "." + suffix, kind

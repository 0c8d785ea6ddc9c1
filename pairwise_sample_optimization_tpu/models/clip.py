"""Generic CLIP text/vision towers in Flax.

One implementation serves every CLIP in the system:
- SDXL text encoder 1 (ViT-L text, 768-wide, quick-gelu, penultimate
  hidden states; reference ``encode_prompt``,
  ``train_online_pso_sdxl_turbo.py:96-118``);
- SDXL text encoder 2 (bigG text, 1280-wide, gelu, with projection —
  pooled output feeds the UNet micro-conditioning);
- PickScore / CLIP-score scorer (ViT-H-14 dual tower, reference
  ``pickscore_utils.py`` + vendored open_clip);
- Aesthetic scorer backbone (ViT-L-14 vision).

Pooling follows HF convention: the hidden state at each sequence's
argmax-token (EOS has the highest id in CLIP vocabs) is the pooled text
feature; vision pools the class token through the final layer norm.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_positions: int = 77
    act: str = "quick_gelu"  # or "gelu"
    # HF CLIP layer_norm_eps (transformers default 1e-5; flax's 1e-6
    # default measurably diverges — caught by tests/test_torch_parity.py)
    norm_eps: float = 1e-5
    projection_dim: Optional[int] = None  # None = no text_projection
    # LoRA on the attention q/k/v/out projections (the DreamBooth
    # --train_text_encoder option, reference ``:1206-1339``)
    lora_rank: int = 0
    lora_use_dora: bool = False  # peft use_dora (ref ``:1333``)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def sdxl_te1(dtype=jnp.bfloat16) -> "CLIPTextConfig":
        return CLIPTextConfig(dtype=dtype)

    @staticmethod
    def sdxl_te2(dtype=jnp.bfloat16) -> "CLIPTextConfig":
        return CLIPTextConfig(
            width=1280, layers=32, heads=20, act="gelu", projection_dim=1280, dtype=dtype
        )

    @staticmethod
    def vit_h14(dtype=jnp.bfloat16) -> "CLIPTextConfig":
        """Text tower of laion CLIP-H (PickScore backbone)."""
        return CLIPTextConfig(
            width=1024, layers=24, heads=16, act="gelu", projection_dim=1024, dtype=dtype
        )

    @staticmethod
    def vit_l14(dtype=jnp.bfloat16) -> "CLIPTextConfig":
        return CLIPTextConfig(projection_dim=768, dtype=dtype)

    @staticmethod
    def tiny(dtype=jnp.float32) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=1000, width=32, layers=2, heads=4, max_positions=77,
            projection_dim=16, dtype=dtype,
        )


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    act: str = "gelu"
    norm_eps: float = 1e-5
    projection_dim: int = 1024
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    # dynamic-int8 MLP matmuls in the encoder layers (opt-in; the global
    # ops.qconv.use_int8_scorer() override also enables it at trace time)
    int8_mlp: bool = False

    @staticmethod
    def vit_h14(dtype=jnp.bfloat16) -> "CLIPVisionConfig":
        return CLIPVisionConfig(dtype=dtype)

    @staticmethod
    def vit_l14(dtype=jnp.bfloat16) -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            width=1024, layers=24, heads=16, act="quick_gelu",
            projection_dim=768, dtype=dtype,
        )

    @staticmethod
    def tiny(dtype=jnp.float32) -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            image_size=28, patch_size=7, width=32, layers=2, heads=4,
            projection_dim=16, dtype=dtype,
        )


def _act(name: str, dtype=jnp.bfloat16):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    if name == "gelu":
        # HF ACT2FN["gelu"] is the exact erf GELU (ViT-H towers use it);
        # flavor follows compute dtype — exact for fp32 parity, tanh
        # under bf16 where the difference is sub-rounding-noise and the
        # erf chain measurably costs (models/layers._gelu_approx)
        from .layers import _gelu_approx

        return lambda x: nn.gelu(x, approximate=_gelu_approx(dtype))
    raise ValueError(name)


class CLIPEncoderLayer(nn.Module):
    width: int
    heads: int
    act: str
    dtype: jnp.dtype
    param_dtype: jnp.dtype
    lora_rank: int = 0
    use_dora: bool = False
    norm_eps: float = 1e-5
    # dynamic-int8 MLP matmuls (fc1/fc2 — ~2/3 of tower FLOPs), param-tree
    # compatible with the bf16 path (models/layers.Int8Dense). Scorer
    # towers only; qualification in scripts/qualify_int8_scorer.py
    int8_mlp: bool = False

    @nn.compact
    def __call__(self, x, causal: bool, lora_scale=1.0):
        from .layers import Int8Dense, LoRADense

        if self.int8_mlp:
            dense = lambda feat, name: Int8Dense(
                feat, dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )
        else:
            dense = lambda feat, name: nn.Dense(
                feat, dtype=self.dtype, param_dtype=self.param_dtype, name=name
            )
        attn_dense = lambda name: LoRADense(
            self.width,
            use_bias=True,
            lora_rank=self.lora_rank,
            use_dora=self.use_dora,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )
        ln = lambda name: nn.LayerNorm(
            epsilon=self.norm_eps, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )
        head_dim = self.width // self.heads

        h = ln("norm1")(x)
        b, s, _ = h.shape
        q = attn_dense("q_proj")(h, lora_scale).reshape(b, s, self.heads, head_dim)
        k = attn_dense("k_proj")(h, lora_scale).reshape(b, s, self.heads, head_dim)
        v = attn_dense("v_proj")(h, lora_scale).reshape(b, s, self.heads, head_dim)
        o = dot_product_attention(q, k, v, causal=causal).reshape(b, s, self.width)
        x = x + attn_dense("out_proj")(o, lora_scale)

        h = ln("norm2")(x)
        h = dense(self.width * 4, "fc1")(h)
        h = _act(self.act, self.dtype)(h)
        x = x + dense(self.width, "fc2")(h)
        return x


class CLIPTextTower(nn.Module):
    """Returns (hidden_states tuple-like, pooled, projected).

    ``output_hidden_index``: -1 = final-LN output; -2 = penultimate layer
    (SDXL consumes ``hidden_states[-2]``).
    """

    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, lora_scale=1.0):
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.width, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="token_embedding",
        )(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.width),
            cfg.param_dtype,
        )
        x = tok + pos[None, :s].astype(cfg.dtype)

        hiddens = [x]
        for i in range(cfg.layers):
            x = CLIPEncoderLayer(
                cfg.width, cfg.heads, cfg.act, cfg.dtype, cfg.param_dtype,
                lora_rank=cfg.lora_rank, use_dora=cfg.lora_use_dora,
                norm_eps=cfg.norm_eps, name=f"layer_{i}",
            )(x, causal=True, lora_scale=lora_scale)
            hiddens.append(x)

        final = nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="final_norm",
        )(x)

        # pooled = final-LN state at the EOS token (highest token id)
        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = final[jnp.arange(b), eos_idx]

        projected = None
        if cfg.projection_dim is not None:
            projected = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                param_dtype=cfg.param_dtype, name="text_projection",
            )(pooled)
        return {
            "hidden_states": hiddens,  # embeddings + per-layer outputs
            "last_hidden_state": final,
            "penultimate": hiddens[-2],
            "pooled": pooled,
            "projected": projected,
        }


class CLIPVisionTower(nn.Module):
    """Patch-embed ViT; returns pooled class-token projection."""

    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        """pixels: (B, H, W, 3), already CLIP-normalized."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="patch_embedding",
        )(pixels.astype(cfg.dtype))
        x = x.reshape(b, -1, cfg.width)
        n_patches = x.shape[1]

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.width,), cfg.param_dtype
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.width)), x], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (n_patches + 1, cfg.width),
            cfg.param_dtype,
        )
        x = x + pos[None].astype(cfg.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="pre_norm",
        )(x)

        from ..ops.qconv import use_int8_scorer

        int8_mlp = cfg.int8_mlp or use_int8_scorer()
        for i in range(cfg.layers):
            x = CLIPEncoderLayer(
                cfg.width, cfg.heads, cfg.act, cfg.dtype, cfg.param_dtype,
                norm_eps=cfg.norm_eps, int8_mlp=int8_mlp, name=f"layer_{i}",
            )(x, causal=False)

        pooled = nn.LayerNorm(
            epsilon=cfg.norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="post_norm",
        )(x[:, 0])
        return nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="visual_projection",
        )(pooled)


class CLIPDualEncoder(nn.Module):
    """Image+text dual encoder (PickScore / CLIP-score shape)."""

    text_config: CLIPTextConfig
    vision_config: CLIPVisionConfig

    def setup(self):
        self.text = CLIPTextTower(self.text_config, name="text")
        self.vision = CLIPVisionTower(self.vision_config, name="vision")
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(4.6052), (), jnp.float32
        )

    def image_features(self, pixels):
        return self.vision(pixels)

    def text_features(self, input_ids):
        return self.text(input_ids)["projected"]

    def __call__(self, pixels, input_ids):
        img = self.image_features(pixels)
        txt = self.text_features(input_ids)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return img, txt, self.logit_scale

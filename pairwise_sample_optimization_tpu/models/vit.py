"""Pre-LN ViT returning all token embeddings (BLIP image encoder).

Unlike the CLIP vision tower (which pools the class token through a
projection), BLIP feeds every patch token to the text encoder's
cross-attention, so this tower returns the full (B, 1+P, W) sequence.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def blip_large(dtype=jnp.bfloat16) -> "ViTConfig":
        return ViTConfig(dtype=dtype)

    @staticmethod
    def tiny(dtype=jnp.float32) -> "ViTConfig":
        return ViTConfig(
            image_size=32, patch_size=8, width=32, layers=2, heads=4, dtype=dtype
        )


class _ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        head_dim = cfg.width // cfg.heads
        ln = lambda name: nn.LayerNorm(
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name
        )
        dense = lambda feat, name: nn.Dense(
            feat, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name
        )
        h = ln("norm1")(x)
        b, s, _ = h.shape
        qkv = dense(3 * cfg.width, "qkv")(h).reshape(b, s, 3, cfg.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        o = dot_product_attention(q, k, v).reshape(b, s, cfg.width)
        x = x + dense(cfg.width, "proj")(o)
        h = ln("norm2")(x)
        h = dense(cfg.width * cfg.mlp_ratio, "fc1")(h)
        # BLIP/timm use exact-erf GELU; tanh under bf16 (layers._gelu_approx)
        from .layers import _gelu_approx

        h = nn.gelu(h, approximate=_gelu_approx(cfg.dtype))
        return x + dense(cfg.width, "fc2")(h)


class ViT(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, 3) normalized pixels -> (B, 1+P, width) tokens."""
        cfg = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="patch_embedding",
        )(pixels.astype(cfg.dtype))
        x = x.reshape(b, -1, cfg.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.width,),
            cfg.param_dtype,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.width)), x], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (x.shape[1], cfg.width),
            cfg.param_dtype,
        )
        x = x + pos[None].astype(cfg.dtype)
        for i in range(cfg.layers):
            x = _ViTBlock(cfg, name=f"block_{i}")(x)
        return nn.LayerNorm(
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="final_norm"
        )(x)

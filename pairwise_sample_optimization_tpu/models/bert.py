"""BERT-style encoder with optional cross-attention (BLIP "med" model).

Backbone of the ImageReward scorer (the reference consumes it via the
``image-reward`` pip package, ``evaluate_sdxl_dmd2.py:43,234``): a
post-LN BERT whose layers interleave self-attention, cross-attention to
image tokens, and a GELU FFN. Only the encoder path ImageReward uses is
implemented (no MLM/decoder heads).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30524  # bert-base + BLIP special tokens
    hidden: int = 768
    layers: int = 12
    heads: int = 12
    intermediate: int = 3072
    max_positions: int = 512
    cross_attention: bool = True
    encoder_width: int = 1024  # image-token width feeding cross-attn
    layer_norm_eps: float = 1e-12
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def blip_base(dtype=jnp.bfloat16) -> "BertConfig":
        return BertConfig(dtype=dtype)

    @staticmethod
    def tiny(dtype=jnp.float32) -> "BertConfig":
        return BertConfig(
            vocab_size=1000, hidden=32, layers=2, heads=4, intermediate=64,
            max_positions=64, encoder_width=32, dtype=dtype,
        )


class _BertAttention(nn.Module):
    cfg: BertConfig
    cross: bool = False

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        cfg = self.cfg
        head_dim = cfg.hidden // cfg.heads
        dense = lambda feat, name: nn.Dense(
            feat, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name
        )
        kv = context if self.cross else x
        b, sq = x.shape[:2]
        sk = kv.shape[1]
        q = dense(cfg.hidden, "query")(x).reshape(b, sq, cfg.heads, head_dim)
        k = dense(cfg.hidden, "key")(kv).reshape(b, sk, cfg.heads, head_dim)
        v = dense(cfg.hidden, "value")(kv).reshape(b, sk, cfg.heads, head_dim)
        if mask is not None:
            # masked positions excluded via large-negative bias on logits
            scale = head_dim**-0.5
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
            logits = logits + jnp.where(mask[:, None, None, :], 0.0, -1e30)
            probs = nn.softmax(logits, axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        else:
            o = dot_product_attention(q, k, v)
        o = o.reshape(b, sq, cfg.hidden)
        return dense(cfg.hidden, "output")(o)


class _BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, context=None, mask=None, context_mask=None):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name=name,
        )
        # post-LN residual blocks (BERT convention)
        x = ln("attn_norm")(x + _BertAttention(cfg, name="attention")(x, mask=mask))
        if cfg.cross_attention and context is not None:
            x = ln("cross_norm")(
                x + _BertAttention(cfg, cross=True, name="crossattention")(
                    x, context=context, mask=context_mask
                )
            )
        h = nn.Dense(
            cfg.intermediate, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="intermediate",
        )(x)
        # HF BERT "gelu" is exact erf; tanh under bf16 (layers._gelu_approx)
        from .layers import _gelu_approx

        h = nn.gelu(h, approximate=_gelu_approx(cfg.dtype))
        h = nn.Dense(
            cfg.hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="ffn_out"
        )(h)
        return ln("ffn_norm")(x + h)


class BertEncoder(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, S)
        attention_mask: Optional[jnp.ndarray] = None,  # (B, S) bool/int
        encoder_hidden_states: Optional[jnp.ndarray] = None,  # (B, S_img, W)
    ):
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="word_embeddings",
        )(input_ids)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (cfg.max_positions, cfg.hidden),
            cfg.param_dtype,
        )
        x = tok + pos[None, :s].astype(cfg.dtype)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="embeddings_norm",
        )(x)

        mask = attention_mask.astype(bool) if attention_mask is not None else None
        context = None
        if encoder_hidden_states is not None:
            # width mismatch vs hidden is fine: cross-attn projects the
            # context through its own key/value denses
            context = encoder_hidden_states.astype(cfg.dtype)
        for i in range(cfg.layers):
            x = _BertLayer(cfg, name=f"layer_{i}")(x, context=context, mask=mask)
        return x

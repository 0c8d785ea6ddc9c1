"""Attention dispatch: XLA fused attention now, Pallas flash-attention hook.

The reference relies on torch SDPA / optional xformers
(``config_sdxl_turbo_dpo.py:40``). On TPU the equivalent hot op is a
block-tiled flash attention over HBM; until the Pallas kernel lands the
XLA path (``jax.nn.dot_product_attention``) already fuses well on the MXU.

All shapes are (B, S, H, D) — batch, sequence, heads, head_dim.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

Impl = Literal["xla", "pallas", "naive"]

_DEFAULT_IMPL: Impl = "xla"
# XLA's fused attention materializes the (B,H,Sq,Skv) logits; beyond this
# many bytes (fp32) route to the tiled Pallas kernel instead — at 1024^2
# the 16384-token self/VAE attentions would otherwise OOM a 16GB chip
_PALLAS_LOGITS_BYTES = 1 << 30


def set_default_impl(impl: Impl) -> None:
    global _DEFAULT_IMPL
    _DEFAULT_IMPL = impl


def _on_tpu() -> bool:
    import jax as _jax

    try:
        return _jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    impl: Impl | None = None,
) -> jnp.ndarray:
    """(B, S, H, D) attention; fp32 softmax accumulation."""
    explicit = impl is not None  # an explicit impl= wins (A/B honesty):
    # only the DEFAULT dispatch auto-reroutes to the flash kernel above
    # the logits-bytes line where XLA cannot materialize the logits
    impl = impl or _DEFAULT_IMPL
    if impl == "pallas" and causal:
        impl = "xla"  # causal towers (CLIP text) use the XLA path
    if impl == "xla" and not causal and not explicit and _on_tpu():
        logits_bytes = 4 * q.shape[0] * q.shape[2] * q.shape[1] * k.shape[1]
        if logits_bytes >= _PALLAS_LOGITS_BYTES:
            impl = "pallas"
    if impl == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal)
    if impl == "xla":
        return jax.nn.dot_product_attention(q, k, v, is_causal=causal)
    # naive reference path (tests / tiny shapes)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if causal:
        s_q, s_k = logits.shape[-2], logits.shape[-1]
        mask = jnp.tril(jnp.ones((s_q, s_k), dtype=bool), k=s_k - s_q)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)

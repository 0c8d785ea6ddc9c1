"""Block-wise 8-bit Adam (bitsandbytes-AdamW8bit parity, optax-style).

The reference trains LoRA with ``bnb.optim.AdamW8bit``
(``train_online_pso_sdxl_turbo.py:428-448``). This transformation stores
both Adam moments as int8 with per-block absmax scales (linear
quantization, block 256), dequantizing to fp32 for the update math.
Moment memory drops 4x vs fp32 (2x vs the bf16-moments option) —
marginal for LoRA-sized states on TPU, provided for capability parity
and for full fine-tuning configs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


class QMoment(NamedTuple):
    """int8 payload + per-block scales; target shape derives from params."""

    q: jnp.ndarray  # (n_blocks, BLOCK) int8
    scale: jnp.ndarray  # (n_blocks,) f32


def _quantize(x: jnp.ndarray) -> QMoment:
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.shape[0]) % BLOCK
    flat = jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)
    scale = jnp.max(jnp.abs(flat), axis=1)
    safe = jnp.where(scale == 0.0, 1.0, scale)[:, None] / 127.0
    q = jnp.clip(jnp.round(flat / safe), -127, 127).astype(jnp.int8)
    return QMoment(q=q, scale=scale / 127.0)


def _dequantize(t: QMoment, shape, size) -> jnp.ndarray:
    flat = t.q.astype(jnp.float32) * t.scale[:, None]
    return flat.reshape(-1)[:size].reshape(shape)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: object  # params-shaped pytree of QMoment
    nu: object


def adam8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW with int8 block-quantized moments."""

    # nu is stored in sqrt domain: quantizing sqrt(nu) halves the dynamic
    # range an int8 absmax block must span (the second moment is the
    # quantization-sensitive one; bitsandbytes uses a nonlinear map for
    # the same reason)
    def init_fn(params):
        zq = lambda p: _quantize(jnp.zeros_like(p, jnp.float32))
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(zq, params),
            nu=jax.tree.map(zq, params),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("adam8bit needs params (weight decay / dtypes)")
        count = state.count + 1
        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        g_leaves, treedef = jax.tree_util.tree_flatten(grads)
        p_leaves = treedef.flatten_up_to(params)
        mu_leaves = treedef.flatten_up_to(state.mu)
        nu_leaves = treedef.flatten_up_to(state.nu)

        updates, new_mu, new_nu = [], [], []
        for g, p, mu_q, nu_q in zip(g_leaves, p_leaves, mu_leaves, nu_leaves):
            g = g.astype(jnp.float32)
            mu = b1 * _dequantize(mu_q, g.shape, g.size) + (1 - b1) * g
            nu_prev = jnp.square(_dequantize(nu_q, g.shape, g.size))
            nu = b2 * nu_prev + (1 - b2) * g * g
            mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            if weight_decay:
                step = step + weight_decay * p.astype(jnp.float32)
            updates.append((-lr * step).astype(p.dtype))
            new_mu.append(_quantize(mu))
            new_nu.append(_quantize(jnp.sqrt(nu)))

        return (
            treedef.unflatten(updates),
            Adam8bitState(
                count=count,
                mu=treedef.unflatten(new_mu),
                nu=treedef.unflatten(new_nu),
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)

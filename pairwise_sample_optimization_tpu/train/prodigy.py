"""Prodigy optimizer (parameter-free Adam) as an optax transformation.

The reference DreamBooth trainer offers ``--optimizer prodigy``
(``train_pso_sdxl_turbo_dreambooth.py:626-668,1523-1548``) via the
``prodigyopt`` package. This is an independent implementation of the
published algorithm (Mishchenko & Defazio, "Prodigy: An Expeditiously
Adaptive Parameter-Free Learner", arXiv 2306.06101 — the D-Adaptation
Adam variant) with the reference-exposed knobs: ``beta3`` (defaults to
sqrt(beta2)), ``decouple`` (AdamW-style weight decay),
``use_bias_correction``, ``safeguard_warmup``, ``d_coef``.

State: Adam moments scaled by the running distance estimate ``d``, the
initial parameters ``p0`` (the distance anchor), an accumulated
numerator r_k = beta3*r + d^2*lr*bc*<g, p0-p> and an accumulated signed
step s_k; ``d`` grows as max(d, d_coef * r / ||s||_1).

All state lives in the pytree (jit/scan/donation-safe); the step is one
fused tree pass, no host sync.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    d: jnp.ndarray  # scalar f32 distance estimate
    numerator: jnp.ndarray  # scalar f32 accumulated r_k
    m: Any  # first moment (scaled by d)
    v: Any  # second moment (scaled by d^2)
    s: Any  # accumulated signed step
    p0: Any  # initial params (distance anchor)


def prodigy(
    learning_rate: float = 1.0,
    beta1: float = 0.9,
    beta2: float = 0.999,
    beta3: Optional[float] = None,
    d0: float = 1e-6,
    d_coef: float = 1.0,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decouple: bool = True,
    use_bias_correction: bool = False,
    safeguard_warmup: bool = False,
    growth_rate: float = math.inf,
) -> optax.GradientTransformation:
    """Prodigy; ``learning_rate`` is the multiplier on the adaptive step
    (1.0 per the paper/reference default)."""
    b3 = math.sqrt(beta2) if beta3 is None else beta3

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ProdigyState(
            step=jnp.zeros((), jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            numerator=jnp.zeros((), jnp.float32),
            m=zeros(),
            v=zeros(),
            s=zeros(),
            # a real copy: p0 must not alias the live param buffers, or
            # donating a train state that holds both faults ("donate the
            # same buffer twice")
            p0=jax.tree.map(jnp.copy, params),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("prodigy needs params (pass them to tx.update)")
        if not decouple and weight_decay:
            # prodigyopt's non-decoupled path folds L2 into the gradient
            # BEFORE the moment updates (grad += wd * p)
            grads = jax.tree.map(
                lambda g, p: g + weight_decay * p.astype(g.dtype), grads, params
            )
        k = state.step
        d = state.d
        if use_bias_correction:
            bc = jnp.sqrt(1.0 - beta2 ** (k + 1).astype(jnp.float32)) / (
                1.0 - beta1 ** (k + 1).astype(jnp.float32)
            )
        else:
            bc = 1.0
        dlr = d * learning_rate * bc

        f32 = lambda t: t.astype(jnp.float32)
        m = jax.tree.map(
            lambda m_, g: beta1 * m_ + (1.0 - beta1) * d * f32(g), state.m, grads
        )
        v = jax.tree.map(
            lambda v_, g: beta2 * v_ + (1.0 - beta2) * d * d * f32(g) * f32(g),
            state.v,
            grads,
        )
        # r_k += (d/d0)*dlr * <g, p0 - p> (global dot across the tree)
        dots = jax.tree.map(
            lambda g, q0, p: jnp.sum(f32(g) * (f32(q0) - f32(p))),
            grads, state.p0, params,
        )
        gdot = jax.tree.reduce(jnp.add, dots, jnp.zeros((), jnp.float32))
        numerator = b3 * state.numerator + (d / d0) * dlr * gdot
        s_scale = (d / d0) * (d if safeguard_warmup else dlr)
        s = jax.tree.map(
            lambda s_, g: b3 * s_ + s_scale * f32(g), state.s, grads
        )
        l1 = jax.tree.reduce(
            jnp.add,
            jax.tree.map(lambda s_: jnp.sum(jnp.abs(s_)), s),
            jnp.zeros((), jnp.float32),
        )
        d_hat = jnp.where(l1 > 0.0, d_coef * numerator / jnp.maximum(l1, 1e-30), d)
        d_new = jnp.where(
            l1 > 0.0, jnp.maximum(d, jnp.minimum(d_hat, d * growth_rate)), d
        )

        def upd(m_, v_, p):
            denom = jnp.sqrt(v_) + d_new * eps
            u = -dlr * m_ / denom
            if decouple and weight_decay:
                u = u - dlr * weight_decay * f32(p)
            return u.astype(p.dtype)

        updates = jax.tree.map(upd, m, v, params)
        new_state = ProdigyState(
            step=k + 1, d=d_new, numerator=numerator, m=m, v=v, s=s, p0=state.p0
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)

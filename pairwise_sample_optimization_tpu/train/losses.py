"""PSO preference construction and losses.

Numerics replicated from the reference (the clamp-before-log order and the
tie-handling of the comparators materially shape the gradient at beta=50):

- ``sample_compare`` — per-sample random reward axis, ties favour
  trajectory 1 ("a_dominates = a <= b" marks the tie as a-dominated,
  i.e. the +1 goes to trajectory 1), reference
  ``train_online_pso_sdxl_turbo.py:401-416``;
- ``pareto_compare`` — strict dominance, ties give a zero row (no
  gradient), reference ``train_online_pso_sdxl_dmd2.py:420-430``;
- ``pso_pairwise_loss`` — -log sigmoid(beta*log(clamp(pi/pi_ref))*pref),
  reference ``:842-850``;
- ``dreambooth_pso_loss`` — Diffusion-DPO style MSE-difference logistic
  (``pso``) or hinge (``pso_db``) loss, reference
  ``train_pso_sdxl_turbo_dreambooth.py:1884-1935``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_compare(
    rewards_a: jnp.ndarray, rewards_b: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """(B, M) multi-reward pair -> (B, 2) preference of {-1, +1}.

    For each sample one of the M reward axes is drawn uniformly; the
    winner on that axis gets +1. Ties count as a-dominates (ref parity).
    Note the reference's sign convention: the *loser* gets -1 in column 0
    when a wins is encoded as [-1, +1] — i.e. column k is the sign carried
    by trajectory k's log-ratio in the loss.
    """
    b, m = rewards_a.shape
    axis = jax.random.randint(key, (b,), 0, m)
    ra = jnp.take_along_axis(rewards_a, axis[:, None], axis=1)[:, 0]
    rb = jnp.take_along_axis(rewards_b, axis[:, None], axis=1)[:, 0]
    a_dom = ra <= rb  # ref: a_dominates means b is preferred (+1 in col 1)
    return jnp.where(
        a_dom[:, None],
        jnp.asarray([-1.0, 1.0], jnp.float32),
        jnp.asarray([1.0, -1.0], jnp.float32),
    )


def pareto_compare(rewards_a: jnp.ndarray, rewards_b: jnp.ndarray) -> jnp.ndarray:
    """Strict Pareto dominance over M axes; non-dominated pairs -> zeros."""
    if rewards_a.ndim == 1:
        rewards_a = rewards_a[:, None]
        rewards_b = rewards_b[:, None]
    a_dom = jnp.all(rewards_a <= rewards_b, axis=1) & jnp.any(
        rewards_a < rewards_b, axis=1
    )
    b_dom = jnp.all(rewards_b <= rewards_a, axis=1) & jnp.any(
        rewards_b < rewards_a, axis=1
    )
    c = jnp.zeros((rewards_a.shape[0], 2), jnp.float32)
    c = jnp.where(a_dom[:, None], jnp.asarray([-1.0, 1.0]), c)
    c = jnp.where(b_dom[:, None], jnp.asarray([1.0, -1.0]), c)
    return c


def pso_pairwise_loss(
    logp_0: jnp.ndarray,
    ref_logp_0: jnp.ndarray,
    logp_1: jnp.ndarray,
    ref_logp_1: jnp.ndarray,
    prefer: jnp.ndarray,  # (B, 2) from a comparator above
    beta: float,
    eps: float,
    clamp_mode: str = "ratio",
) -> jnp.ndarray:
    """-log sigmoid(beta*(log r0)*pref0 + beta*(log r1)*pref1), mean over B.

    ``clamp_mode``:
    - "ratio" (reference parity): clamp exp(logp - ref) to [1-eps, 1+eps]
      *before* the log (``:844-845``) — bounds each per-step advantage to
      +-beta*log(1+-eps), and costs an exp/log round trip;
    - "logratio" (fixed variant): clip the log-ratio directly to
      [log(1-eps), log(1+eps)] — same bound, numerically direct;
    - "none": unclamped DPO logits.
    """
    d0 = logp_0 - ref_logp_0
    d1 = logp_1 - ref_logp_1
    if clamp_mode == "ratio":
        d0 = jnp.log(jnp.clip(jnp.exp(d0), 1.0 - eps, 1.0 + eps))
        d1 = jnp.log(jnp.clip(jnp.exp(d1), 1.0 - eps, 1.0 + eps))
    elif clamp_mode == "logratio":
        lo, hi = jnp.log1p(-eps), jnp.log1p(eps)
        d0 = jnp.clip(d0, lo, hi)
        d1 = jnp.clip(d1, lo, hi)
    elif clamp_mode != "none":
        raise ValueError(f"unknown clamp_mode {clamp_mode}")
    inner = beta * d0 * prefer[:, 0] + beta * d1 * prefer[:, 1]
    return -jnp.mean(jax.nn.log_sigmoid(inner))


def dreambooth_pso_loss(
    model_losses_w: jnp.ndarray,  # (B,) winner (instance) denoise MSE
    model_losses_l: jnp.ndarray,  # (B,) loser (self-generated) denoise MSE
    ref_losses_w: jnp.ndarray | None,
    ref_losses_l: jnp.ndarray | None,
    beta: float,
    loss_type: str = "pso",  # "pso" | "pso_db"
    neg_defactor: float = 1.0,
    prior_loss_weight: float = 0.0,
):
    """Offline/DreamBooth PSO objective. Returns (loss, logits) where
    ``logits > 0`` is the implicit-preference accuracy signal."""
    model_diff = model_losses_w - neg_defactor * model_losses_l
    if loss_type == "pso":
        if ref_losses_w is None or ref_losses_l is None:
            raise ValueError("loss_type 'pso' needs reference losses")
        ref_diff = ref_losses_w - neg_defactor * ref_losses_l
        logits = ref_diff - model_diff
        loss = -jnp.mean(jax.nn.log_sigmoid(beta * logits))
    elif loss_type == "pso_db":
        logits = -model_diff
        loss = jnp.mean(jax.nn.relu(1.0 - beta * logits))
    else:
        raise ValueError(f"unknown loss_type {loss_type}")
    if prior_loss_weight > 0.0:
        loss = loss + prior_loss_weight * jnp.mean(model_losses_l)
    return loss, logits

"""LoRA-only train state and optimizer.

The reference trains only the LoRA adapter with AdamW8bit
(``train_online_pso_sdxl_turbo.py:428-448``) and clips grads to
``max_grad_norm`` (``:857-861``). Here the trainable tree IS the 'lora'
collection, so no parameter filtering/masking is needed; base UNet params
ride along frozen. Optimizer state for ~46M LoRA params is small on TPU,
so full-precision adamw is the default; ``state_dtype=bfloat16`` halves
moment memory (the TPU stand-in for bitsandbytes 8-bit state).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import optax


class PSOTrainState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    lora: Any  # trainable adapter pytree
    opt_state: optax.OptState

    @classmethod
    def create(cls, lora, tx: optax.GradientTransformation) -> "PSOTrainState":
        return cls(step=jnp.zeros((), jnp.int32), lora=lora, opt_state=tx.init(lora))

    def apply_gradients(self, grads, tx: optax.GradientTransformation) -> "PSOTrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.lora)
        new_lora = optax.apply_updates(self.lora, updates)
        return PSOTrainState(step=self.step + 1, lora=new_lora, opt_state=new_opt)


def make_optimizer(
    learning_rate: float = 1e-5,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-6,
    max_grad_norm: float = 1.0,
    state_dtype: jnp.dtype | None = None,
    schedule: optax.Schedule | None = None,
    use_8bit: bool = False,
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping (reference hyperparameters).

    ``use_8bit`` selects the block-quantized int8-moment AdamW
    (bitsandbytes-AdamW8bit parity); ``state_dtype=bfloat16`` is the
    lighter-touch alternative (bf16 first moment).
    """
    lr = schedule if schedule is not None else learning_rate
    if use_8bit:
        from .quantized_adam import adam8bit

        adam = adam8bit(lr, b1=beta1, b2=beta2, eps=eps, weight_decay=weight_decay)
    else:
        adam = optax.adamw(
            lr,
            b1=beta1,
            b2=beta2,
            eps=eps,
            weight_decay=weight_decay,
            mu_dtype=state_dtype,
        )
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), adam)

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


def make_lr_schedule(
    name: str,
    learning_rate: float,
    warmup_steps: int = 0,
    total_steps: int = 0,
    num_cycles: float | None = None,
    power: float = 1.0,
    lr_end: float = 1e-7,
) -> optax.Schedule:
    """diffusers ``get_scheduler`` name-compatible LR schedules
    (reference ``train_pso_sdxl_turbo_dreambooth.py:1614-1622``:
    --lr_scheduler/--lr_warmup_steps/--lr_num_cycles/--lr_power).

    Names: constant | constant_with_warmup | linear | cosine |
    cosine_with_restarts | polynomial. All include the linear warmup.
    """
    import math as _math

    w = max(int(warmup_steps), 0)
    t = max(int(total_steps), w + 1)

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(s / jnp.maximum(w, 1), 1.0) if w else jnp.ones(())
        progress = jnp.clip((s - w) / jnp.maximum(t - w, 1), 0.0, 1.0)
        if name == "constant":
            # diffusers "constant" has NO warmup (that's constant_with_warmup)
            return jnp.full((), learning_rate)
        elif name == "constant_with_warmup":
            factor = jnp.ones(())
        elif name == "linear":
            factor = 1.0 - progress
        elif name == "cosine":
            cycles = 0.5 if num_cycles is None else float(num_cycles)
            factor = jnp.maximum(
                0.0, 0.5 * (1.0 + jnp.cos(_math.pi * cycles * 2.0 * progress))
            )
        elif name == "cosine_with_restarts":
            cycles = 1.0 if num_cycles is None else float(num_cycles)
            factor = jnp.where(
                progress >= 1.0,
                0.0,
                jnp.maximum(
                    0.0, 0.5 * (1.0 + jnp.cos(_math.pi * ((cycles * progress) % 1.0)))
                ),
            )
        elif name == "polynomial":
            # matches transformers: decay from lr to lr_end with given power
            factor = jnp.where(
                progress >= 1.0,
                lr_end / learning_rate,
                ((learning_rate - lr_end) * (1.0 - progress) ** power + lr_end)
                / learning_rate,
            )
        else:
            raise ValueError(f"unknown lr scheduler {name!r}")
        return learning_rate * warm * factor

    return sched


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

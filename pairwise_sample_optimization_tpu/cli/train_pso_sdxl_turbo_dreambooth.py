"""DreamBooth/offline PSO on SDXL-Turbo — entry-point parity with the
reference ``personalization/train_pso_sdxl_turbo_dreambooth.py``.

Winner = the user's instance images; losers = images the pretrained model
generates for the class prompt at step 0 (reference ``negative_sample``,
``:123-154``, regeneration hardcoded to step 0 ``:1702-1703``). The
TPU-native difference: instance/negative VAE moments are precomputed once
and re-sampled on device per step — no per-step host image loading.

Usage:
  python -m pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth \
      --instance_data_dir dog/ --instance_prompt "a photo of sks dog" \
      --class_prompt "a photo of dog" --max_train_steps 1600
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoints import export_lora_safetensors, save_train_state
from ..data import CLIPTokenizer, HashTokenizer
from ..data.dreambooth import DreamBoothDataset
from ..pipeline import SDXLPipeline
from ..train import PSOTrainState, make_optimizer
from ..train.dreambooth_pso import DreamBoothPSOConfig, DreamBoothPSOTrainer
from ..utils import MetricLogger, get_logger

logger = get_logger("pso.dreambooth")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # model / data
    p.add_argument("--pretrained_model_dir", default="")
    p.add_argument("--bpe_path", default=os.environ.get("PSO_BPE_PATH", ""))
    p.add_argument("--instance_data_dir", required=True)
    p.add_argument("--instance_prompt", required=True)
    p.add_argument("--class_prompt", default="")
    p.add_argument("--output_dir", default="dreambooth-pso-output")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--repeats", type=int, default=1)
    # train
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--adam_weight_decay", type=float, default=1e-4)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--max_train_steps", type=int, default=1600)
    p.add_argument("--rank", type=int, default=16, help="LoRA rank")
    p.add_argument("--seed", type=int, default=0)
    # PSO
    p.add_argument("--loss_type", choices=["pso", "pso_db"], default="pso_db")
    p.add_argument("--beta_pso", type=float, default=5.0)
    p.add_argument("--neg_defactor", type=float, default=1.0)
    p.add_argument("--num_negatives", type=int, default=20)
    p.add_argument("--prior_loss_weight", type=float, default=0.5)
    p.add_argument("--distill_train_timesteps", type=int, default=4)
    # logging / ckpt
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--validation_steps", type=int, default=500)
    p.add_argument("--num_validation_images", type=int, default=4)
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--tiny", action="store_true", help="toy models (smoke/CI)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # ---- pipeline ----
    if args.pretrained_model_dir:
        pipe = SDXLPipeline.from_torch_dir(
            args.pretrained_model_dir,
            lora_rank=args.rank,
            resolution=args.resolution,
            bpe_path=args.bpe_path,
        )
    else:
        logger.warning("no --pretrained_model_dir: random weights (smoke mode)")
        pipe = SDXLPipeline.random(
            lora_rank=args.rank, resolution=args.resolution,
            bpe_path=args.bpe_path, tiny=args.tiny,
        )

    if args.bpe_path and os.path.exists(args.bpe_path):
        tok1 = CLIPTokenizer(args.bpe_path)
        tok2 = CLIPTokenizer(args.bpe_path, pad_token_id=0)
    else:
        vs = pipe.te1.config.vocab_size
        tok1 = HashTokenizer(vocab_size=vs)
        tok2 = HashTokenizer(vocab_size=vs, pad_token_id=0)

    encode_text = jax.jit(pipe.encode_prompt)
    encode_image = jax.jit(
        lambda px: pipe.vae.apply(pipe.vae_variables, px, method=pipe.vae.encode)
    )
    scaling = pipe.vae.config.scaling_factor

    # ---- data: instance images -> VAE moments (precomputed once) ----
    dataset = DreamBoothDataset(
        args.instance_data_dir, args.instance_prompt, args.resolution, args.repeats
    )
    inst_px = jnp.asarray(np.stack(dataset.pixel_values))
    inst_mean, inst_logvar = encode_image(inst_px)

    # ---- negatives: self-generated for the class prompt at step 0 ----
    class_prompt = args.class_prompt or args.instance_prompt
    neg_cond = encode_text(
        jnp.asarray(tok1([class_prompt])), jnp.asarray(tok2([class_prompt]))
    )
    gen = jax.jit(lambda cond, key: pipe.generate(cond, key, num_steps=4))
    negs = []
    for i in range(args.num_negatives):
        img = gen(neg_cond, jax.random.fold_in(jax.random.key(args.seed + 1), i))
        negs.append(np.asarray(img)[0])
        if (i + 1) % 5 == 0:
            logger.info("generated %d/%d negatives", i + 1, args.num_negatives)
    neg_px = jnp.asarray(np.stack(negs))
    neg_mean, neg_logvar = encode_image(neg_px)

    # ---- trainer ----
    cfg = DreamBoothPSOConfig(
        loss_type=args.loss_type,
        beta=args.beta_pso,
        neg_defactor=args.neg_defactor,
        prior_loss_weight=args.prior_loss_weight,
        distill_train_timesteps=args.distill_train_timesteps,
    )
    tx = make_optimizer(
        learning_rate=args.learning_rate,
        weight_decay=args.adam_weight_decay,
        max_grad_norm=args.max_grad_norm,
    )
    trainer = DreamBoothPSOTrainer(cfg, pipe.unet_apply, tx)
    state = PSOTrainState.create(pipe.unet_variables["lora"], tx)

    inst_cond = encode_text(
        jnp.asarray(tok1([args.instance_prompt] * args.train_batch_size)),
        jnp.asarray(tok2([args.instance_prompt] * args.train_batch_size)),
    )

    @jax.jit
    def draw_latents(mean, logvar, idx, key):
        m = mean[idx]
        lv = logvar[idx]
        z = m + jnp.exp(0.5 * lv) * jax.random.normal(key, m.shape, m.dtype)
        return (z * scaling).astype(jnp.float32)

    mlog = MetricLogger(args.output_dir, "dreambooth_pso", use_wandb=args.use_wandb)
    rng = np.random.default_rng(args.seed)
    root = jax.random.key(args.seed)

    for step in range(args.max_train_steps):
        k = jax.random.fold_in(root, step)
        ki, kn, ku = jax.random.split(k, 3)
        inst_idx = jnp.asarray(
            rng.choice(len(dataset), args.train_batch_size, replace=len(dataset) < args.train_batch_size)
        )
        neg_idx = jnp.asarray(
            rng.choice(args.num_negatives, args.train_batch_size, replace=False)
        )
        batch = {
            "instance_latents": draw_latents(inst_mean, inst_logvar, inst_idx, ki),
            "negative_latents": draw_latents(neg_mean, neg_logvar, neg_idx, kn),
            "cond": inst_cond,
        }
        state, aux = trainer.update(state, pipe.unet_variables["params"], batch, ku)

        if (step + 1) % 10 == 0 or step == 0:
            mlog.log_metrics({k2: float(v) for k2, v in aux.items()}, step + 1)
        if (step + 1) % args.checkpointing_steps == 0 or step + 1 == args.max_train_steps:
            path = save_train_state(args.output_dir, step + 1, state, {"step": step + 1})
            lora_dir = os.path.join(args.output_dir, f"lora-{step + 1}")
            os.makedirs(lora_dir, exist_ok=True)
            export_lora_safetensors(
                state.lora, os.path.join(lora_dir, "pytorch_lora_weights.safetensors")
            )
            logger.info("saved %s", path)

    mlog.close()
    return state


if __name__ == "__main__":
    main()

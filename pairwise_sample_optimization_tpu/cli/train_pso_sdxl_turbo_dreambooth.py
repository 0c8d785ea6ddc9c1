"""DreamBooth/offline PSO on SDXL-Turbo — entry-point parity with the
reference ``personalization/train_pso_sdxl_turbo_dreambooth.py``.

Winner = the user's instance images; losers = images the pretrained model
generates for the class prompt at step 0 (reference ``negative_sample``,
``:123-154``, regeneration hardcoded to step 0 ``:1702-1703``). The
TPU-native difference: instance/negative VAE moments are precomputed once
and re-sampled on device per step — no per-step host image loading.

Full feature parity with the reference trainer:
- gradient accumulation (``:1123,1720``) — a lax.scan inside one jitted
  update;
- text-encoder LoRA training (``--train_text_encoder``, ``:1330-1339``)
  with a separate ``--text_encoder_lr`` (``:1460-1474``);
- the 25-prompt validation suite every ``--validation_steps``
  (``:157-293``), images saved under ``gen_<step>/p_xxx/``;
- resume (``--resume_from_checkpoint``; the reference parses it at
  ``:547-555`` but forces ``initial_global_step = 0`` — wired for real
  here);
- EDM / EulerDiscrete / DDPM scheduler spaces (``--scheduler_space``;
  reference auto-detection ``:1229-1240``).

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
import optax

from ..checkpoints import (
    export_sdxl_lora_safetensors,
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from ..data.dreambooth import DreamBoothDataset
from ..models.sdxl_text import compute_time_ids, time_ids_from_records
from ..pipeline import SDXLPipeline
from ..train import PSOTrainState
from ..train.db_validation import (
    dreambooth_validation_prompts,
    run_dreambooth_validation,
)
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
    p.add_argument("--center_crop", action="store_true",
                   help="center crop instead of the reference's default "
                        "random crop (ref :479-489)")
    p.add_argument("--random_flip", action="store_true")
    # train
    p.add_argument("--train_batch_size", type=int, default=1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--learning_rate", type=float, default=2e-4)
    p.add_argument("--scale_lr", action="store_true",
                   help="scale lr by ga * batch_size * n_processes (ref :833-836)")
    p.add_argument("--text_encoder_lr", type=float, default=5e-6)
    p.add_argument("--train_text_encoder", action="store_true")
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--max_train_steps", type=int, default=None,
                   help="default: num_train_epochs * steps per epoch")
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--rank", type=int, default=16, help="LoRA rank")
    p.add_argument("--use_dora", action="store_true",
                   help="weight-decomposed LoRA (ref --use_dora :741, peft DoRA)")
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="rematerialize UNet blocks in backward (ref :1201)")
    p.add_argument("--gradient_checkpointing_mode", default="full",
                   choices=["full", "resnets", "dots", "lowres", "lowres_dots"],
                   help="remat policy used when --gradient_checkpointing is "
                        "set (beyond-parity: the reference only has on/off)")
    p.add_argument("--seed", type=int, default=0)
    # optimizer (reference :620-668,1479-1565)
    p.add_argument("--optimizer", default="AdamW",
                   help='"AdamW" or "prodigy" (case-insensitive)')
    p.add_argument("--use_8bit_adam", action="store_true",
                   help="block-quantized int8-moment AdamW (bnb AdamW8bit parity)")
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--adam_weight_decay", type=float, default=1e-4)
    p.add_argument("--adam_weight_decay_text_encoder", type=float, default=1e-3)
    p.add_argument("--prodigy_beta3", type=float, default=None,
                   help="default sqrt(beta2)")
    p.add_argument("--prodigy_decouple", type=lambda s: s.lower() != "false",
                   default=True)
    p.add_argument("--prodigy_use_bias_correction",
                   type=lambda s: s.lower() != "false", default=True)
    p.add_argument("--prodigy_safeguard_warmup",
                   type=lambda s: s.lower() != "false", default=True)
    # lr schedule (reference get_scheduler :1614-1622)
    p.add_argument("--lr_scheduler", default="constant",
                   choices=["constant", "constant_with_warmup", "linear",
                            "cosine", "cosine_with_restarts", "polynomial"])
    p.add_argument("--lr_warmup_steps", type=int, default=500)
    p.add_argument("--lr_num_cycles", type=int, default=1)
    p.add_argument("--lr_power", type=float, default=1.0)
    # prior preservation (reference :463-478,1155-1199)
    p.add_argument("--with_prior_preservation", action="store_true",
                   help="append class images from --class_data_dir "
                        "(pregenerated there if fewer than "
                        "--num_class_images exist) to the WINNER half with "
                        "class-prompt conditioning (reference collate_fn "
                        ":1015-1019); losers stay the step-0 self-generated "
                        "negatives")
    p.add_argument("--class_data_dir", default="")
    p.add_argument("--num_class_images", type=int, default=100)
    p.add_argument("--sample_batch_size", type=int, default=4,
                   help="batch size for class-image pregeneration")
    p.add_argument("--resume_from_checkpoint", default="",
                   help="checkpoint dir, or 'latest' to scan output_dir")
    # scheduler space (reference auto-detect :1229-1240 + --do_edm_style_training)
    p.add_argument("--scheduler_space", choices=["euler_edm", "edm", "ddpm"],
                   default="euler_edm",
                   help="euler_edm = the reference scripts' branch "
                        "(--do_edm_style_training on EulerDiscrete)")
    p.add_argument("--prediction_type", choices=["epsilon", "v_prediction"],
                   default="epsilon")
    p.add_argument("--direct_timestep_indexing", action="store_true",
                   help="use lattice values as timesteps directly instead of "
                        "the reference's descending-table indexing")
    # PSO
    p.add_argument("--loss_type", choices=["pso", "pso_db"], default="pso_db")
    p.add_argument("--beta_pso", type=float, default=5.0)
    p.add_argument("--neg_defactor", type=float, default=1.0)
    p.add_argument("--num_negatives", type=int, default=20)
    p.add_argument("--prior_loss_weight", type=float, default=0.5)
    p.add_argument("--distill_train_timesteps", type=int, default=4)
    # validation (reference log_validation :157-293)
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=None,
                   help="keep only the newest N checkpoints (ref :540-545)")
    p.add_argument("--validation_steps", type=int, default=500)
    p.add_argument("--num_validation_images", type=int, default=4)
    p.add_argument("--unique_token", default="sks")
    p.add_argument("--class_name", default="",
                   help="defaults to the last word of --class_prompt")
    p.add_argument("--is_object", action="store_true",
                   help="object prompt list (vs live-subject outfits list)")
    p.add_argument("--skip_validation", action="store_true")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--output_kohya_format", action="store_true",
                   help="also export kohya-ss-layout LoRA safetensors "
                        "(ref --output_kohya_format :735)")
    p.add_argument("--tiny", action="store_true", help="toy models (smoke/CI)")
    p.add_argument("--fast_init", action="store_true",
                   help="zero-fill weights instead of random init when no "
                        "--pretrained_model_dir (skips the minutes-long "
                        "full-size init program; throughput/compile smokes)")
    # ---- reference-inert parity knobs (accepted for drop-in script
    # compatibility; each is a no-op in the reference's own PSO loss path) --
    p.add_argument("--snr_gamma", type=float, default=None,
                   help="PARITY-INERT: the reference only guards EDM+snr "
                        "(:1097); the PSO loss never applies SNR weighting")
    p.add_argument("--gamma_pso", type=float, default=1.0,
                   help="PARITY-INERT: parsed but unused by the reference "
                        "(:764-772)")
    p.add_argument("--neg_generate_freq", type=int, default=800,
                   help="PARITY-INERT: reference hardcodes negative "
                        "regeneration to step 0 (:1702-1703)")
    return p.parse_args(argv)


def _make_optimizer(args, total_steps: int):
    """Optimizer + lr schedule + global-norm clip, matching the reference's
    factory (``:1479-1565``): AdamW (optionally 8-bit) or Prodigy, separate
    TE lr/weight-decay groups (``params_to_optimize`` ``:1458-1476``),
    diffusers-style lr scheduler (``get_scheduler`` ``:1614-1622``).
    The clip is GLOBAL over the joint tree (ref ``:1953-1958``)."""
    from ..train import make_lr_schedule

    lr = args.learning_rate
    te_lr = args.text_encoder_lr
    if args.scale_lr:
        scale = args.gradient_accumulation_steps * args.train_batch_size * max(
            jax.process_count(), 1
        )
        lr, te_lr = lr * scale, te_lr * scale

    opt = args.optimizer.lower()
    if opt not in ("adamw", "prodigy"):
        raise ValueError(
            f"Unsupported optimizer {args.optimizer!r}: choose AdamW or prodigy"
        )

    sched = lambda base: make_lr_schedule(
        args.lr_scheduler, base, args.lr_warmup_steps, total_steps,
        num_cycles=args.lr_num_cycles, power=args.lr_power,
    )

    if opt == "prodigy":
        from ..train.prodigy import prodigy

        if lr <= 0.1:
            logger.warning(
                "prodigy usually wants --learning_rate around 1.0 (got %g)", lr
            )
        if args.train_text_encoder and te_lr != lr:
            # reference overrides the TE lr to the main lr for prodigy
            # (it cannot mix per-group lrs with a shared d estimate)
            logger.warning(
                "prodigy: overriding --text_encoder_lr to --learning_rate"
            )
        inner = prodigy(
            learning_rate=lr,
            beta1=args.adam_beta1,
            beta2=args.adam_beta2,
            beta3=args.prodigy_beta3,
            eps=args.adam_epsilon,
            weight_decay=args.adam_weight_decay,
            decouple=args.prodigy_decouple,
            use_bias_correction=args.prodigy_use_bias_correction,
            safeguard_warmup=args.prodigy_safeguard_warmup,
        )
        # diffusers runs its lr scheduler on top of prodigy's lr=1-style
        # multiplier; reproduce as a multiplicative factor on the update
        if args.lr_scheduler != "constant":
            s = sched(lr)
            inner = optax.chain(
                inner, optax.scale_by_schedule(lambda k: s(k) / lr)
            )
    else:
        def adamw(base_lr, wd):
            kw = dict(
                b1=args.adam_beta1, b2=args.adam_beta2,
                eps=args.adam_epsilon, weight_decay=wd,
            )
            if args.use_8bit_adam:
                from ..train.quantized_adam import adam8bit

                return adam8bit(sched(base_lr), **kw)
            return optax.adamw(sched(base_lr), **kw)

        if args.train_text_encoder and (
            te_lr != lr
            or args.adam_weight_decay_text_encoder != args.adam_weight_decay
        ):
            inner = optax.multi_transform(
                {
                    "unet": adamw(lr, args.adam_weight_decay),
                    "te": adamw(te_lr, args.adam_weight_decay_text_encoder),
                },
                param_labels={"unet": "unet", "te1": "te", "te2": "te"},
            )
        else:
            inner = adamw(lr, args.adam_weight_decay)
    return optax.chain(optax.clip_by_global_norm(args.max_grad_norm), inner)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    te_lora_rank = args.rank if args.train_text_encoder else 0

    # ---- pipeline ----
    remat = args.gradient_checkpointing_mode if args.gradient_checkpointing else False
    if args.pretrained_model_dir:
        pipe = SDXLPipeline.from_torch_dir(
            args.pretrained_model_dir,
            lora_rank=args.rank,
            resolution=args.resolution,
            bpe_path=args.bpe_path,
            te_lora_rank=te_lora_rank,
            use_dora=args.use_dora,
            remat=remat,
            # frozen towers in bf16 storage (16GB chip; LoRA masters
            # stay fp32 via lora_param_dtype)
            param_dtype=jnp.bfloat16,
        )
    else:
        logger.warning(
            "no --pretrained_model_dir: %s weights (smoke mode)",
            "zero-filled" if args.fast_init else "random",
        )
        pipe = SDXLPipeline.random(
            lora_rank=args.rank, resolution=args.resolution,
            bpe_path=args.bpe_path, tiny=args.tiny, te_lora_rank=te_lora_rank,
            use_dora=args.use_dora, remat=remat,
            # full-size random weights must still fit the 16GB chip: same
            # bf16 storage as from_torch_dir's budget (tiny CPU models
            # keep fp32 params for test numerics). Init stays genuinely
            # random unless --fast_init asks for the cheap zero-fill.
            param_dtype=None if args.tiny else jnp.bfloat16,
            fast_init=args.fast_init,
        )

    from ..data import make_clip_tokenizers

    tok1, tok2 = make_clip_tokenizers(args.bpe_path, pipe.te1.config.vocab_size)

    # weights as jit ARGUMENTS (a bound-method jit would capture the
    # towers as trace-time constants: zero-filled smoke weights constant-
    # fold; real weights risk HBM duplication in the executable)
    _encode_text_v = jax.jit(pipe.encode_prompt_v)

    def encode_text(i1, i2):
        return _encode_text_v(pipe.te1_variables, pipe.te2_variables, i1, i2)

    _encode_image_v = jax.jit(
        lambda vv, px: pipe.vae.apply(vv, px, method=pipe.vae.encode)
    )

    def encode_image(px):
        return _encode_image_v(pipe.vae_variables, px)
    scaling = pipe.vae.config.scaling_factor

    # ---- data: instance images -> VAE moments (precomputed once) ----
    dataset = DreamBoothDataset(
        args.instance_data_dir, args.instance_prompt, args.resolution,
        args.repeats, center_crop=args.center_crop,
        random_flip=args.random_flip, seed=args.seed,
    )
    inst_px = jnp.asarray(np.stack(dataset.pixel_values))
    inst_mean, inst_logvar = encode_image(inst_px)
    # per-view SDXL micro-conditioning recorded by the dataset
    inst_time_pool = time_ids_from_records(
        dataset.original_sizes, dataset.crop_top_lefts, args.resolution
    )

    # ---- total steps (reference epochs->steps math :1638-1650) ----
    per_step = args.train_batch_size * args.gradient_accumulation_steps
    steps_per_epoch = max(1, -(-dataset.num_source // per_step))
    total_steps = args.max_train_steps or args.num_train_epochs * steps_per_epoch

    # ---- negatives: self-generated for the class prompt at step 0 ----
    class_prompt = args.class_prompt or args.instance_prompt
    neg_cond = encode_text(
        jnp.asarray(tok1([class_prompt])), jnp.asarray(tok2([class_prompt]))
    )
    _gen_v = jax.jit(
        lambda uv, vv, cond, key: pipe.generate(
            cond, key, num_steps=4, unet_variables=uv, vae_variables=vv
        )
    )

    def gen(cond, key):
        return _gen_v(pipe.unet_variables, pipe.vae_variables, cond, key)

    def generate_images(n, key0, note, batch_size=1):
        """n images in --sample_batch_size batches (one compile; the
        final partial batch is over-generated and trimmed)."""
        bsz = max(1, min(batch_size, n))
        cond_b = jax.tree.map(
            lambda x: jnp.tile(x, (bsz,) + (1,) * (x.ndim - 1)), neg_cond
        )
        out = []
        for i in range(-(-n // bsz)):
            img = gen(cond_b, jax.random.fold_in(key0, i))
            out.extend(np.asarray(img))
            logger.info("generated %d/%d %s", min(len(out), n), n, note)
        return out[:n]

    negs = generate_images(
        args.num_negatives, jax.random.key(args.seed + 1), "negatives",
        batch_size=args.sample_batch_size,
    )
    neg_px = jnp.asarray(np.stack(negs))
    num_neg_pool = args.num_negatives
    neg_mean, neg_logvar = encode_image(neg_px)

    # ---- prior preservation: class images join the WINNER half ----
    # (reference collate_fn appends class images + class prompt to the
    # win half, ``:1015-1019``; the negatives above stay the losers for
    # both halves — class photos are the preservation signal, so pushing
    # the model AWAY from them would invert the feature)
    use_prior = bool(args.with_prior_preservation and args.class_data_dir)
    class_mean = class_logvar = None
    num_class_pool = 0
    if use_prior:
        # class pool on disk, pregenerated up to --num_class_images
        # (reference :1155-1199); batched generation honors
        # --sample_batch_size
        os.makedirs(args.class_data_dir, exist_ok=True)
        existing = sorted(
            f for f in os.listdir(args.class_data_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
        )
        missing = args.num_class_images - len(existing)
        if missing > 0:
            from PIL import Image

            logger.info("pregenerating %d class images", missing)
            imgs = generate_images(
                missing, jax.random.key(args.seed + 2), "class images",
                batch_size=args.sample_batch_size,
            )
            for j, im in enumerate(imgs):
                arr = np.clip((im + 1.0) * 127.5, 0, 255).astype(np.uint8)
                Image.fromarray(arr).save(
                    os.path.join(
                        args.class_data_dir, f"class-{len(existing) + j:05d}.png"
                    )
                )
        class_ds = DreamBoothDataset(
            args.class_data_dir, class_prompt, args.resolution
        )
        class_px = jnp.asarray(np.stack(class_ds.pixel_values))
        num_class_pool = len(class_ds)
        class_mean, class_logvar = encode_image(class_px)
        class_time_pool = time_ids_from_records(
            class_ds.original_sizes, class_ds.crop_top_lefts, args.resolution
        )

    # ---- prompt encoding for the trainer ----
    def encode_with_te_lora(te_params, te_loras, ids1, ids2):
        """Re-encode prompts with live TE LoRA (gradients flow)."""
        from ..models.sdxl_text import encode_sdxl_prompt

        embeds, pooled = encode_sdxl_prompt(
            pipe.te1,
            {"params": te_params["te1"], "lora": te_loras["te1"]},
            pipe.te2,
            {"params": te_params["te2"], "lora": te_loras["te2"]},
            ids1,
            ids2,
        )
        return {
            "embeds": embeds,
            "pooled": pooled,
            "time_ids": compute_time_ids(ids1.shape[0], args.resolution),
        }

    # ---- trainer ----
    cfg = DreamBoothPSOConfig(
        loss_type=args.loss_type,
        beta=args.beta_pso,
        neg_defactor=args.neg_defactor,
        prior_loss_weight=args.prior_loss_weight,
        distill_train_timesteps=args.distill_train_timesteps,
        scheduler_space=args.scheduler_space,
        prediction_type=args.prediction_type,
        descending_table=not args.direct_timestep_indexing,
        grad_accum=args.gradient_accumulation_steps,
        train_text_encoder=args.train_text_encoder,
        # DoRA cannot ride the per-sample-scale fusion: run the frozen
        # reference as a separate static-scale-0 forward
        fuse_ref_pass=not args.use_dora,
    )
    tx = _make_optimizer(args, total_steps)
    # data-parallel mesh (reference DreamBooth runs under accelerate-DDP,
    # ``:228-233``): frozen weights replicated, per-step batches sharded
    # over ``data`` inside trainer.update, grads psum'd by XLA
    from ..parallel.mesh import make_mesh, replicate

    mesh = make_mesh()
    pipe.unet_variables = replicate(mesh, pipe.unet_variables)
    pipe.vae_variables = replicate(mesh, pipe.vae_variables)
    pipe.te1_variables = replicate(mesh, pipe.te1_variables)
    pipe.te2_variables = replicate(mesh, pipe.te2_variables)
    trainer = DreamBoothPSOTrainer(
        cfg, pipe.unet_apply, tx,
        encode_prompt=encode_with_te_lora if args.train_text_encoder else None,
        mesh=mesh,
    )
    if args.train_text_encoder:
        lora0 = {
            "unet": pipe.unet_variables["lora"],
            "te1": pipe.te1_variables["lora"],
            "te2": pipe.te2_variables["lora"],
        }
        train_params = {
            "unet": pipe.unet_variables["params"],
            "te1": pipe.te1_variables["params"],
            "te2": pipe.te2_variables["params"],
        }
    else:
        lora0 = pipe.unet_variables["lora"]
        train_params = pipe.unet_variables["params"]
    state = PSOTrainState.create(lora0, tx)

    # ---- resume ----
    start_step = 0
    if args.resume_from_checkpoint:
        path = (
            latest_checkpoint(args.output_dir)
            if args.resume_from_checkpoint == "latest"
            else args.resume_from_checkpoint
        )
        if path:
            state, extra = restore_train_state(path, state, {"step": 0})
            start_step = int(extra.get("step", int(state.step)))
            logger.info("resumed from %s at step %d", path, start_step)
        else:
            logger.warning("no checkpoint found to resume from; starting fresh")
    # trainable + optimizer state replicated over the mesh (DDP-equivalent)
    state = replicate(mesh, state)

    ga, b = args.gradient_accumulation_steps, args.train_batch_size
    ids1 = jnp.asarray(tok1([args.instance_prompt] * b))
    ids2 = jnp.asarray(tok2([args.instance_prompt] * b))
    if use_prior:
        # the win half doubles: [instance(b) | class(b)], class images
        # conditioned on the class prompt (reference :1015-1019,1593-1596)
        ids1 = jnp.concatenate([ids1, jnp.asarray(tok1([class_prompt] * b))], 0)
        ids2 = jnp.concatenate([ids2, jnp.asarray(tok2([class_prompt] * b))], 0)
    b_eff = int(ids1.shape[0])
    inst_cond = encode_text(ids1, ids2)

    def microbatched(x):
        """(ga*b_eff, ...) -> (ga, b_eff, ...) when accumulating, else identity."""
        return x.reshape((ga, b_eff) + x.shape[1:]) if ga > 1 else x

    def win_half(inst, cls):
        """Per-microbatch winner half [instance(b) | class(b)] from two
        (ga*b, ...) pools (mirrors the reference collate order)."""
        inst = inst.reshape((ga, b) + inst.shape[1:])
        cls = cls.reshape((ga, b) + cls.shape[1:])
        out = jnp.concatenate([inst, cls], axis=1)
        return out if ga > 1 else out[0]

    @jax.jit
    def draw_latents(mean, logvar, idx, key):
        m = mean[idx]
        lv = logvar[idx]
        z = m + jnp.exp(0.5 * lv) * jax.random.normal(key, m.shape, m.dtype)
        return (z * scaling).astype(jnp.float32)

    # ---- validation ----
    class_name = args.class_name or (class_prompt.split()[-1] if class_prompt else "thing")
    val_prompts = dreambooth_validation_prompts(
        args.unique_token, class_name, args.is_object
    )

    def val_generate(prompt, key, n):
        i1 = jnp.asarray(tok1([prompt] * n))
        i2 = jnp.asarray(tok2([prompt] * n))
        if args.train_text_encoder:
            # validation must see the TRAINED text encoders (the reference
            # builds the validation pipeline from the live TEs,
            # ``log_validation`` :157-293) — not the zero-init LoRA baked
            # into the jitted encode_text
            c = encode_with_te_lora(
                train_params,
                {"te1": state.lora["te1"], "te2": state.lora["te2"]},
                i1,
                i2,
            )
            unet_lora = state.lora["unet"]
        else:
            c = encode_text(i1, i2)
            unet_lora = state.lora
        return pipe.generate(
            c, key, num_steps=4,
            unet_variables={"params": pipe.unet_variables["params"], "lora": unet_lora},
        )

    def save_all(step1):
        path = save_train_state(args.output_dir, step1, state, {"step": step1})
        lora_dir = os.path.join(args.output_dir, f"lora-{step1}")
        os.makedirs(lora_dir, exist_ok=True)
        trees = (
            dict(state.lora)
            if args.train_text_encoder
            else {"unet": state.lora}
        )
        export_sdxl_lora_safetensors(
            trees, os.path.join(lora_dir, "pytorch_lora_weights.safetensors")
        )
        if args.output_kohya_format:
            from ..checkpoints import export_kohya_lora_safetensors

            export_kohya_lora_safetensors(
                trees,
                os.path.join(lora_dir, "pytorch_lora_weights_kohya.safetensors"),
            )
        if args.checkpoints_total_limit:
            from ..checkpoints.orbax_io import prune_checkpoints

            prune_checkpoints(args.output_dir, int(args.checkpoints_total_limit))
        logger.info("saved %s", path)

    mlog = MetricLogger(args.output_dir, "dreambooth_pso", use_wandb=args.use_wandb)
    # per-process offset decorrelates the host-local draws (the reference's
    # per-rank DataLoader shards under DDP); process 0 = single-host seed
    rng = np.random.default_rng(args.seed + start_step + 7919 * jax.process_index())
    root = jax.random.key(args.seed)

    for step in range(start_step, total_steps):
        k = jax.random.fold_in(root, step)
        ki, kn, ku, kc = jax.random.split(k, 4)
        n_draw = ga * b
        inst_idx = jnp.asarray(
            rng.choice(len(dataset), n_draw, replace=len(dataset) < n_draw)
        )
        n_neg = ga * b_eff  # losers mirror the (possibly doubled) win half
        neg_idx = jnp.asarray(
            rng.choice(num_neg_pool, n_neg, replace=num_neg_pool < n_neg)
        )
        inst_lat = draw_latents(inst_mean, inst_logvar, inst_idx, ki)
        if use_prior:
            class_idx = jnp.asarray(
                rng.choice(
                    num_class_pool, n_draw, replace=num_class_pool < n_draw
                )
            )
            win_lat = win_half(
                inst_lat, draw_latents(class_mean, class_logvar, class_idx, kc)
            )
        else:
            win_lat = microbatched(inst_lat)
        # per-image SDXL micro-conditioning (reference collate records
        # original_size + crop_top_left per view): the win half carries
        # the dataset's coordinates, the lose half the generator's
        # defaults (negatives are self-generated at the target size)
        tw_inst = inst_time_pool[inst_idx]
        if use_prior:
            time_ids_win = win_half(tw_inst, class_time_pool[class_idx])
        else:
            time_ids_win = microbatched(tw_inst)
        batch = {
            "instance_latents": win_lat,
            "negative_latents": microbatched(
                draw_latents(neg_mean, neg_logvar, neg_idx, kn)
            ),
            "time_ids_win": time_ids_win,
            "time_ids_lose": microbatched(
                compute_time_ids(n_neg, args.resolution)
            ),
        }
        if args.train_text_encoder:
            batch["input_ids_one"] = microbatched(jnp.tile(ids1, (ga, 1)))
            batch["input_ids_two"] = microbatched(jnp.tile(ids2, (ga, 1)))
        else:
            batch["cond"] = jax.tree.map(
                lambda x: microbatched(jnp.tile(x, (ga,) + (1,) * (x.ndim - 1))),
                inst_cond,
            )
        state, aux = trainer.update(state, train_params, batch, ku)

        if (step + 1) % 10 == 0 or step == 0:
            mlog.log_metrics({k2: float(v) for k2, v in aux.items()}, step + 1)
        # checkpointing_steps=0 disables periodic saves (the final-step
        # export still runs) — same semantics as the online runner
        if (
            args.checkpointing_steps
            and (step + 1) % args.checkpointing_steps == 0
        ) or step + 1 == total_steps:
            save_all(step + 1)
        if (
            not args.skip_validation
            and args.validation_steps
            and (step + 1) % args.validation_steps == 0
        ):
            root_dir = run_dreambooth_validation(
                val_generate, val_prompts, args.output_dir, step + 1,
                num_images_per_prompt=args.num_validation_images, seed=args.seed,
                metric_logger=mlog,
            )
            logger.info("validation images at %s", root_dir)

    mlog.close()
    return state


if __name__ == "__main__":
    main()

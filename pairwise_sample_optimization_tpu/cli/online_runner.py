"""Shared online-PSO run loop for the SDXL-Turbo and SDXL-DMD2 CLIs.

Orchestrates the full reference loop (``train_online_pso_sdxl_turbo.py``
epoch structure: sample pair batches -> log rewards -> shuffled DPO
updates -> periodic checkpoint + PickaPic validation) on top of the
jitted programs in ``train.online_pso``. Host code here only moves
prompts and metrics; trajectories, images, rewards and gradients stay on
device.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoints import (
    export_lora_safetensors,
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from ..checkpoints.orbax_io import prune_checkpoints
from ..data import PromptDataset, PromptLoader
from ..models.clip import CLIPTextConfig, CLIPVisionConfig
from ..parallel.mesh import (
    MeshSpec,
    fetch_replicated,
    make_mesh,
    move_to_memory_kind,
    replicate,
    shard_global_batch,
)
from ..pipeline import SDXLPipeline
from ..rewards import CLIPScorer, PickScoreScorer
from ..train import (
    OnlinePSOConfig,
    OnlinePSOTrainer,
    PSOTrainState,
    make_optimizer,
)
from ..utils import MetricLogger, PhaseTimer, get_logger

logger = get_logger("pso.online")


def build_tokenizers(config, vocab_size: int = 49408):
    from ..data import make_clip_tokenizers

    return make_clip_tokenizers(
        config.pretrained.bpe_path, vocab_size, with_reward=True
    )


def run_online_pso(
    config,
    sampler: str,
    num_epochs: Optional[int] = None,
    debug_out: Optional[dict] = None,
):
    """Returns the final (state, metrics_history) — importable for tests.

    ``debug_out``: optional dict the runner fills with mesh/sharding
    introspection (used by ``__graft_entry__.dryrun_multichip`` and the
    mesh tests to assert the CLI path really shards onto the mesh).
    """
    from ..parallel.multihost import maybe_initialize_distributed
    from ..utils.cache import enable_compilation_cache

    maybe_initialize_distributed()
    enable_compilation_cache()

    # ---- kernels config ----
    from ..ops import attention as attention_ops
    from ..ops import group_norm as gn_ops

    attention_ops.set_default_impl(config.kernels.attention_impl)
    gn_ops.set_use_pallas(config.kernels.fused_groupnorm)
    from ..ops import upsample as upsample_ops

    upsample_ops.set_use_subpixel(
        bool(config.kernels.get("subpixel_upsample", False))
    )
    from ..ops import qconv as qconv_ops

    qconv_ops.set_use_int8_decode(
        bool(config.kernels.get("int8_vae_decode", False))
    )
    _sa = float(config.kernels.get("int8_smooth_alpha", 0.0))
    qconv_ops.set_int8_smooth_alpha(_sa if _sa > 0.0 else None)
    from ..models.layers import set_gelu_exact

    set_gelu_exact(bool(config.kernels.get("gelu_exact", False)))

    mesh = make_mesh(MeshSpec(config.mesh.data, config.mesh.model))
    logger.info("mesh: %s", mesh)

    dtype = jnp.bfloat16 if config.mixed_precision == "bf16" else jnp.float32
    resolution = config.sample.resolution

    # ---- models ----
    rank = config.train.lora_rank if config.use_lora else 0
    tiny = bool(config.get("tiny_model", False))
    param_dtype = (
        jnp.bfloat16 if config.get("param_dtype", "float32") == "bfloat16" else None
    )
    remat_knob = config.get("activation_checkpoint", "full")
    _REMAT_MODES = ("full", "resnets", "dots", "lowres", "lowres_dots")
    if remat_knob in _REMAT_MODES:
        remat = remat_knob
    elif remat_knob in ("", "none", False, None, True):
        # bools for schema compat; True means the default "full"
        remat = "full" if remat_knob is True else False
    else:
        raise ValueError(
            f"activation_checkpoint={remat_knob!r}: expected one of "
            f"{_REMAT_MODES + ('', 'none')} (a typo here must not silently "
            "run a different remat configuration)"
        )
    if config.pretrained.model_dir:
        pipe = SDXLPipeline.from_torch_dir(
            config.pretrained.model_dir,
            lora_rank=rank,
            dtype=dtype,
            resolution=resolution,
            bpe_path=config.pretrained.bpe_path,
            param_dtype=param_dtype,
            remat=remat,
            unet_attention_impl=config.kernels.get("unet_attention_impl", "") or None,
        )
    else:
        logger.warning("no pretrained model_dir -- random weights (smoke mode)")
        pipe = SDXLPipeline.random(
            lora_rank=rank, dtype=dtype, resolution=resolution,
            bpe_path=config.pretrained.bpe_path, tiny=tiny,
            param_dtype=param_dtype, remat=remat,
            fast_init=bool(config.get("fast_init", False)),
            unet_attention_impl=config.kernels.get("unet_attention_impl", "") or None,
        )
    pipe.decode_chunk = int(config.get("vae_decode_chunk", 0))
    if config.pretrained.vae_dir:
        # separate VAE weights (the fp16-fix VAE swap the reference does by
        # loading ``madebyollin/sdxl-vae-fp16-fix``-style checkpoints)
        import functools as _ft

        from ..checkpoints import load_torch_state_dict, torch_to_flax, vae_param_map

        vae_path = config.pretrained.vae_dir
        if os.path.isdir(vae_path):
            cands = [
                f for f in sorted(os.listdir(vae_path))
                if f.endswith((".safetensors", ".bin"))
            ]
            vae_path = os.path.join(vae_path, cands[0])
        sd = load_torch_state_dict(vae_path)
        nm = _ft.partial(
            vae_param_map, n_levels=len(pipe.vae.config.block_out_channels)
        )
        pipe.vae_variables["params"], _ = torch_to_flax(
            sd, pipe.vae_variables["params"], nm, strict=True
        )
        logger.info("loaded VAE weights from %s", config.pretrained.vae_dir)

    sc_kwargs = (
        {}
        if tiny
        else {
            "param_dtype": param_dtype,
            "fast_init": bool(config.get("fast_init", False)),
        }
    )
    scorer = PickScoreScorer(
        text_config=CLIPTextConfig.tiny() if tiny else CLIPTextConfig.vit_h14(dtype=dtype),
        vision_config=CLIPVisionConfig.tiny() if tiny else CLIPVisionConfig.vit_h14(dtype=dtype),
        **sc_kwargs,
    )
    if config.pretrained.pickscore_dir:
        # PickScore ships as one HF CLIPModel state dict
        from ..checkpoints import load_hf_clip_dual

        scorer.variables = load_hf_clip_dual(
            config.pretrained.pickscore_dir, scorer.variables
        )
        logger.info("loaded PickScore weights from %s", config.pretrained.pickscore_dir)

    tok1, tok2, tok_r = build_tokenizers(
        config, vocab_size=pipe.te1.config.vocab_size if tiny else 49408
    )
    dataset = PromptDataset(config.prompt_json)
    loader = PromptLoader(
        dataset,
        config.sample.batch_size,
        tok1,
        tok2,
        reward_tokenizer=tok_r,
        seed=config.seed + jax.process_index(),  # per-host prompt streams
    )

    # ---- trainer ----
    # trained timesteps: the reference asserts the knob equals
    # num_steps - 1 (``train_online_pso_sdxl_turbo.py:221``)
    train_timesteps = int(config.train.get("distilled_train_steps", 0)) or (
        config.sample.num_steps - 1
    )
    assert train_timesteps == config.sample.num_steps - 1, (
        f"train.distilled_train_steps ({train_timesteps}) must equal "
        f"sample.num_steps - 1 ({config.sample.num_steps - 1}) — the last "
        "denoise step is deterministic and never trained (reference "
        "train_online_pso_sdxl_turbo.py:221)"
    )
    full_ft = not config.use_lora
    ocfg = OnlinePSOConfig(
        sampler=sampler,
        num_steps=config.sample.num_steps,
        beta=config.train.beta,
        eps=config.train.eps,
        # train.batch_size is PER HOST (reference: per GPU). The sampled
        # epoch is assembled globally over the mesh, so each update
        # slices a global microbatch of per-host-bs x process_count —
        # the DDP-equivalent global batch, grads psum'd by XLA.
        train_batch_size=config.train.batch_size * jax.process_count(),
        grad_accum=config.train.gradient_accumulation_steps,
        num_inner_epochs=config.train.num_inner_epochs,
        compare="sample" if sampler == "turbo" else "pareto",
        clamp_mode=str(config.train.get("clamp_mode", "ratio")),
        shared_noise=bool(config.sample.get("shared_noise", True)),
        num_train_timesteps=train_timesteps,
        # full finetune runs policy/ref as separate applies (different weights)
        # fallback matches the config's measured default (unfused is ~27%
        # faster end-to-end; a trimmed config must not silently regress)
        fuse_ref_pass=bool(config.train.get("fuse_ref_pass", False)) and not full_ft,
        full_finetune=full_ft,
        int8_ref_pass=bool(config.train.get("int8_ref_pass", False)),
    )
    tx = make_optimizer(
        learning_rate=config.train.learning_rate,
        beta1=config.train.adam_beta1,
        beta2=config.train.adam_beta2,
        eps=config.train.adam_epsilon,
        weight_decay=config.train.adam_weight_decay,
        max_grad_norm=config.train.max_grad_norm,
        state_dtype=jnp.bfloat16 if config.train.optimizer_state_dtype == "bfloat16" else None,
        use_8bit=bool(config.train.get("use_8bit_adam", False)),
    )

    # decode/reward weights ride through ``aux_variables`` as jit ARGUMENTS
    # (closure captures would bake GBs of constants into the executable)
    def decode_fn(latents, aux):
        return pipe.decode(latents, aux["vae"])

    def reward_fn(images, reward_cond, aux):
        img = scorer._image_features_v(aux["scorer"], images)
        return jnp.sum(reward_cond["text_features"] * img, axis=-1)

    trainer = OnlinePSOTrainer(
        ocfg,
        pipe.unet_apply,
        tx,
        decode_fn=decode_fn,
        reward_fn=reward_fn,
        latent_hw=pipe.latent_hw,
        mesh=mesh,
    )

    # ---- place weights on the mesh ----
    # The reference gets multi-device for free from ``accelerate launch``
    # (DDP replicas, ``train_online_pso_sdxl_turbo.py:228-233``); the
    # TPU-native equivalent is explicit: frozen weight suites replicated
    # (or FSDP-sharded under ``mesh.fsdp``) over the mesh, batches sharded
    # over ``data`` below — XLA then inserts the ICI collectives.
    use_fsdp = bool(config.mesh.get("fsdp", False))
    offload_aux = bool(config.get("offload_aux_during_update", False))
    use_tp = dict(mesh.shape).get("model", 1) > 1
    if use_tp and use_fsdp:
        raise ValueError(
            "mesh.fsdp combines weight sharding over 'data' with "
            "mesh.model>1 width sharding — unsupported; pick one"
        )
    if use_tp:
        # tensor parallel over the ``model`` axis (capability beyond the
        # DDP-only reference): UNet attention/GEGLU width-sharded per
        # parallel/tp.py; VAE + scorer stay replicated (GSPMD inserts the
        # ICI collectives where data-sharded activations meet them)
        from ..parallel.tp import shard_unet_params

        pipe.unet_variables = shard_unet_params(pipe.unet_variables, mesh)
        pipe.vae_variables = replicate(mesh, pipe.vae_variables)
        scorer.variables = replicate(mesh, scorer.variables)
        pipe.te1_variables = replicate(mesh, pipe.te1_variables)
        pipe.te2_variables = replicate(mesh, pipe.te2_variables)
    else:
        if use_fsdp:
            from ..parallel.fsdp import shard_params_fsdp

            place_frozen = lambda tree: shard_params_fsdp(tree, mesh)
        else:
            place_frozen = lambda tree: replicate(mesh, tree)
        pipe.unet_variables["params"] = place_frozen(pipe.unet_variables["params"])
        pipe.vae_variables = place_frozen(pipe.vae_variables)
        scorer.variables = place_frozen(scorer.variables)
        # the TE towers must be mesh-placed too: an uncommitted tree works
        # by accident (jit auto-moves it) until anything commits it — e.g.
        # the pinned_host offload roundtrip — and then encode's mixed
        # device assignments fail to lower
        pipe.te1_variables = place_frozen(pipe.te1_variables)
        pipe.te2_variables = place_frozen(pipe.te2_variables)
        if not full_ft:
            pipe.unet_variables["lora"] = replicate(mesh, pipe.unet_variables["lora"])
    aux_vars = {"vae": pipe.vae_variables, "scorer": scorer.variables}

    # ---- state / resume ----
    # trainable tree: LoRA adapters, or the full param tree (use_lora=False;
    # the frozen reference copy then lives in pipe.unet_variables["params"])
    trainable = pipe.unet_variables["params"] if full_ft else pipe.unet_variables["lora"]
    state = PSOTrainState.create(trainable, tx)
    start_epoch = 0
    if config.resume_from:
        ckpt = latest_checkpoint(config.resume_from)
        if ckpt:
            state, extra = restore_train_state(
                ckpt, jax.eval_shape(lambda: state), {"epoch": 0}
            )
            # continue the epoch numbering: restarting at 0 would replay
            # the epoch-keyed RNG streams (sampling noise, shuffles) and
            # prompt permutations of already-trained epochs
            start_epoch = int(extra.get("epoch", 0)) + 1
            logger.info(
                "resumed from %s (step %d, epoch %d)",
                ckpt, int(state.step), start_epoch,
            )
    # trainable + optimizer state replicated (the DDP-equivalent part) —
    # or width-sharded in step with the TP params; grad reduction over
    # ``data`` comes from the sharded update batches
    if use_tp:
        from ..parallel.tp import shard_state_tp

        state = shard_state_tp(state, mesh, full_finetune=full_ft)
    else:
        state = replicate(mesh, state)

    # TE towers + scorer text features: weights as jit ARGUMENTS — jitting
    # the bound methods (``jax.jit(pipe.encode_prompt)``) would bake the
    # GB-scale towers into the executables as constants
    encode = jax.jit(pipe.encode_prompt_v)
    text_feats = scorer._text_features  # jitted, takes (variables, ids)

    # ---- validation: live-weight 4-step generation + PickScore/CLIP ----
    # (the reference serializes LoRA to disk and reloads a whole pipeline
    # per validation, ``train_online_pso_sdxl_turbo.py:886-902``; here it is
    # one jitted call sharing HBM weights with training). The CLIP tower is
    # built LAZILY: at full size it is ~2 GB of HBM a validation-off run
    # (every throughput config) must not pay.
    _clip_scorer_box = []

    def get_clip_scorer():
        if not _clip_scorer_box:
            _clip_scorer_box.append(CLIPScorer(
                text_config=CLIPTextConfig.tiny() if tiny else CLIPTextConfig.vit_h14(dtype=dtype),
                vision_config=CLIPVisionConfig.tiny() if tiny else CLIPVisionConfig.vit_h14(dtype=dtype),
                **sc_kwargs,
            ))
        return _clip_scorer_box[0]
    # val_dataset resolution order: a local prompts-JSON path, a HF
    # datasets source ("hf:<name-or-save_to_disk-dir>", the reference's
    # yuvalkirstain/pickapic_v1_no_images — hub names need network),
    # else the builtin prompt set
    val_src = str(config.val_dataset)
    if val_src.startswith("hf:"):
        val_dataset = PromptDataset(
            hf_dataset=val_src[3:], split=config.get("val_split_name", None)
        )
    else:
        val_dataset = PromptDataset(
            val_src if os.path.exists(val_src) else None,
            split=config.get("val_split_name", None),
        )
    val_prompts = val_dataset.prompts[: config.val_max_prompts]

    def _policy_variables(trainable):
        if full_ft:
            return {"params": trainable}
        return {"params": pipe.unet_variables["params"], "lora": trainable}

    @jax.jit
    def _val_generate(trainable, vae_vars, te1_vars, te2_vars, ids1, ids2, key):
        # live train-state weights enter as jit ARGUMENTS — the reference
        # reloads a whole pipeline from disk per validation (``:886-902``);
        # trace-time swapping of pipe.unet_variables would bake them instead
        cond = pipe.encode_prompt_v(te1_vars, te2_vars, ids1, ids2)
        gen = pipe.generate if sampler == "turbo" else pipe.generate_dmd
        return gen(
            cond, key, num_steps=4,
            unet_variables=_policy_variables(trainable),
            vae_variables=vae_vars,
        )

    def _save_images(images, step, limit=5):
        """First few validation images as PNGs (ref saves 5, ``:183-184``)."""
        try:
            from PIL import Image
        except ImportError:
            return
        arr = ((np.asarray(images[:limit]) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        img_dir = os.path.join(out_dir, f"val-{step}")
        os.makedirs(img_dir, exist_ok=True)
        for i, a in enumerate(arr):
            Image.fromarray(a).save(os.path.join(img_dir, f"{i}.png"))

    def run_validation(state, step):
        bs = max(config.sample.batch_size, 1)
        ps_scores, clip_scores = [], []
        for start in range(0, len(val_prompts), bs):
            chunk = val_prompts[start : start + bs]
            if len(chunk) < bs:
                chunk = chunk + [chunk[-1]] * (bs - len(chunk))
            ids1 = jnp.asarray(tok1(chunk))
            ids2 = jnp.asarray(tok2(chunk))
            images = _val_generate(
                state.lora, pipe.vae_variables,
                pipe.te1_variables, pipe.te2_variables, ids1, ids2,
                jax.random.fold_in(jax.random.key(config.seed), start),
            )
            if start == 0 and jax.process_index() == 0:
                _save_images(images, step)
                metrics_logger.log_images(
                    "validation", images[:5], step, captions=chunk[:5]
                )
            r_ids = jnp.asarray(tok_r(chunk))
            ps_scores.append(np.asarray(scorer.score(images, r_ids)))
            clip_scores.append(np.asarray(get_clip_scorer().score(images, r_ids)))
        n = len(val_prompts)
        ps = np.concatenate(ps_scores)[:n].mean()
        cs = np.concatenate(clip_scores)[:n].mean()
        metrics_logger.log_metrics(
            {"val/pickscore": float(ps), "val/clip_score": float(cs)}, step
        )

    out_dir = os.path.join(config.output_dir, config.run_name or f"online_{sampler}")
    metrics_logger = MetricLogger(
        out_dir, config.run_name, use_wandb=config.use_wandb,
        config=config.to_dict() if hasattr(config, "to_dict") else None,
    )
    timer = PhaseTimer()
    history = []
    # PROCESS-INVARIANT root key: every jitted program here runs SPMD over
    # globally-sharded arrays, so all hosts must pass identical key args —
    # a per-host fold would make train_epoch's shuffle compute a DIFFERENT
    # permutation of the same global batch on each host (duplicating some
    # samples, dropping others). Per-host decorrelation of the DATA (the
    # reference's set_seed(device_specific=True)) comes from the
    # PromptLoader's seed + process_index stream, not from this key.
    root_key = jax.random.key(config.seed)

    from ..utils.timers import profile_to

    epochs = num_epochs if num_epochs is not None else config.num_epochs
    global_step = int(state.step)
    profile_dir = config.get("profile_dir", "")
    # trace the SECOND epoch when there is one (epoch 0 pays the
    # compiles); a single-epoch run still gets its trace
    profile_epoch = start_epoch + (1 if epochs > 1 else 0)
    # num_epochs counts epochs run by THIS invocation; under resume the
    # epoch INDEX continues from the checkpoint (fresh RNG streams)
    for epoch in range(start_epoch, start_epoch + epochs):
        trace_cm = profile_to(profile_dir if epoch == profile_epoch else None)
        trace_cm.__enter__()
        ekey = jax.random.fold_in(root_key, epoch)
        # ---------------- sampling ----------------
        all_samples, all_cond = [], []
        with timer.phase("sample"):
            for b_idx, batch in enumerate(loader.epoch()):
                variables = _policy_variables(state.lora)
                # per-host prompt shards -> one global batch, sharded over
                # the ``data`` mesh axis (everything downstream — sampling,
                # decode, reward — then runs SPMD over the mesh)
                ids = shard_global_batch(
                    mesh,
                    {
                        "one": np.asarray(batch["input_ids_one"]),
                        "two": np.asarray(batch["input_ids_two"]),
                        "reward": np.asarray(batch["reward_input_ids"]),
                    },
                )
                cond = encode(
                    pipe.te1_variables, pipe.te2_variables, ids["one"], ids["two"]
                )
                rc = {"text_features": text_feats(scorer.variables, ids["reward"])}
                samples, _images = trainer.sample_pairs(
                    variables, cond, rc, jax.random.fold_in(ekey, b_idx),
                    aux_variables=aux_vars,
                )
                if debug_out is not None and epoch == 0 and b_idx == 0:
                    debug_out["mesh"] = mesh
                    debug_out["fsdp"] = use_fsdp
                    debug_out["ids_sharding"] = ids["one"].sharding
                    debug_out["params_shardings"] = jax.tree.map(
                        lambda x: x.sharding, pipe.unet_variables["params"]
                    )
                    debug_out["samples_sharding"] = samples["log_probs"].sharding
                    # dryrun's DMD noise-pattern audit: the exact
                    # sampling-time tensors needed to recompute eps and
                    # recover the batch-shared re-noise draws
                    debug_out["samples"] = samples
                    debug_out["cond0"] = cond
                    # host copies: the LoRA leaves alias state.lora, whose
                    # buffers the update donates — stale refs would read
                    # deleted arrays
                    debug_out["policy_variables"] = jax.tree.map(
                        np.asarray, variables
                    )
                    debug_out["unet_apply"] = pipe.unet_apply
                all_samples.append(samples)
                all_cond.append(cond)
                logger.info(
                    "epoch %d: sampled pair batch %d/%d",
                    epoch, b_idx + 1, config.sample.num_batches_per_epoch,
                )
                if b_idx + 1 == config.sample.num_batches_per_epoch:
                    break
            # value READBACK, not block_until_ready: through the axon
            # tunnel block_until_ready can return before execution
            # completes — only readback reliably syncs (phase timers
            # would otherwise attribute sample time to the train phase)
            fetch_replicated(mesh, all_samples[-1]["log_probs"])

        samples = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *all_samples)
        cond = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *all_cond)

        # cross-process reward stats (reference gathers rewards over ranks
        # before logging, ``train_online_pso_sdxl_turbo.py:679-687``).
        # The batch is globally assembled over the mesh, so replicating it
        # IS the gather (multi-host: an ICI all-gather via jit identity).
        rewards = fetch_replicated(mesh, samples["rewards"])
        metrics_logger.log_metrics(
            {
                "epoch": epoch,
                "reward_mean": rewards.mean(),
                "reward_std": rewards.std(),
            },
            global_step,
        )

        # ---------------- training ----------------
        if offload_aux:
            # park the sampling-phase-only weight suites (VAE + scorer +
            # TE towers, ~4-5.5 GB at full size) in TPU-host memory for the
            # update's duration: the freed HBM is what the dots-policy
            # remat / larger micro-batches need (BENCHMARKS.md). PCIe
            # round-trip is ~0.5 s/epoch against a multi-second update.
            aux_vars = move_to_memory_kind(aux_vars, "pinned_host")
            pipe.vae_variables = aux_vars["vae"]
            scorer.variables = aux_vars["scorer"]
            pipe.te1_variables = move_to_memory_kind(pipe.te1_variables, "pinned_host")
            pipe.te2_variables = move_to_memory_kind(pipe.te2_variables, "pinned_host")
        with timer.phase("train"):
            state, step_metrics = trainer.train_epoch(
                state,
                pipe.unet_variables["params"],
                samples,
                cond,
                jax.random.fold_in(ekey, 1 << 20),
            )
            # readback sync (see the sampling-phase note)
            fetch_replicated(mesh, jax.tree.leaves(state.lora)[0])
        if offload_aux:
            aux_vars = move_to_memory_kind(aux_vars, "device")
            pipe.vae_variables = aux_vars["vae"]
            scorer.variables = aux_vars["scorer"]
            pipe.te1_variables = move_to_memory_kind(pipe.te1_variables, "device")
            pipe.te2_variables = move_to_memory_kind(pipe.te2_variables, "device")
        for m in step_metrics:
            global_step += 1
            metrics_logger.log_metrics({**m, **timer.summary()}, global_step)
            history.append(m)

            if config.validation_steps and global_step % config.validation_steps == 0:
                with timer.phase("validation"):
                    run_validation(state, global_step)

            if config.checkpointing_steps and (
                global_step % config.checkpointing_steps == 0 or global_step == 1
            ):
                # orbax save is COLLECTIVE for multi-host global arrays:
                # every process must enter it (a rank-0-only save would
                # hang at orbax's cross-process barrier); host-side
                # artifacts (LoRA export, pruning) stay on process 0
                path = save_train_state(out_dir, global_step, state, {"epoch": epoch})
                if jax.process_index() == 0:
                    if not full_ft:
                        # diffusers-interop LoRA export beside the orbax dir
                        lora_dir = os.path.join(out_dir, f"lora-{global_step}")
                        os.makedirs(lora_dir, exist_ok=True)
                        export_lora_safetensors(
                            state.lora,
                            os.path.join(lora_dir, "pytorch_lora_weights.safetensors"),
                        )
                    prune_checkpoints(out_dir, int(config.num_checkpoint_limit))
                    logger.info("saved state to %s", path)
        timer.reset()
        trace_cm.__exit__(None, None, None)

    metrics_logger.close()
    return state, history

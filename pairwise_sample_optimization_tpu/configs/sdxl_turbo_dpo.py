"""Online PSO SDXL-Turbo config (knob-set parity with reference
``config/config_sdxl_turbo_dpo.py`` + TPU-specific additions).

ml_collections ConfigDict with absl config_flags dotted-override
ergonomics: ``--config=...sdxl_turbo_dpo.py --config.train.beta=25``.
"""

import ml_collections


def get_config():
    config = ml_collections.ConfigDict()

    # ---- general ----
    config.run_name = ""
    config.seed = 0
    config.logdir = "logging"
    config.output_dir = "output"
    config.num_epochs = 10000
    config.checkpointing_steps = 100
    config.num_checkpoint_limit = 10
    # compute dtype for frozen towers; LoRA + optimizer state stay fp32
    config.mixed_precision = "bf16"  # "bf16" | "no"
    # storage dtype for frozen tower weights ("bfloat16" to fit a 16GB
    # chip; LoRA masters stay fp32 regardless)
    config.param_dtype = "float32"
    # rematerialize UNet blocks in backward (ref gradient checkpointing):
    # "full" | "resnets" | "dots" (save weight-matmul outputs, recompute
    # elementwise+attention) | "lowres" (full remat at high-res levels
    # only) | "lowres_dots" | "" (off)
    config.activation_checkpoint = "full"
    # park VAE/scorer/TE weights in TPU-host memory during the update
    # phase (frees ~4-5.5GB of HBM at full size for remat=dots / larger
    # micro-batches; costs a ~0.5s/epoch PCIe round-trip)
    config.offload_aux_during_update = False
    # toy 2-level models end-to-end (CI smoke / CPU bringup)
    config.tiny_model = False
    # zero-fill random weights from eval_shape (fast bringup/throughput runs)
    config.fast_init = False
    # capture a jax.profiler device trace of epoch 0 into this dir
    config.profile_dir = ""
    config.resume_from = ""  # run dir or exact checkpoint-### dir (wired!)
    config.use_lora = True
    config.use_wandb = False

    # ---- validation ----
    config.val_dataset = "pickapic_test_unique"  # name or prompts-json path
    config.val_split_name = "test_unique"
    config.val_max_prompts = 500
    config.validation_steps = 100

    # ---- pretrained ----
    config.pretrained = pretrained = ml_collections.ConfigDict()
    # local diffusers-layout checkpoint dir (ported via checkpoints.convert);
    # empty -> architecture-true random init (smoke/bench runs)
    pretrained.model_dir = ""
    pretrained.vae_dir = ""
    pretrained.pickscore_dir = ""
    pretrained.bpe_path = ""

    # ---- mesh / parallelism (TPU-native; reference had DDP-only) ----
    config.mesh = mesh = ml_collections.ConfigDict()
    mesh.data = -1  # -1: all devices
    # >1 enables tensor parallelism: UNet attention/GEGLU width-sharded
    # over the model axis (parallel/tp.py), trainable state sharded in
    # step; incompatible with mesh.fsdp
    mesh.model = 1
    # ZeRO-3-style sharding of the frozen weight suite (UNet params, VAE,
    # scorer towers) over the data axis; trainable LoRA + optimizer state
    # stay replicated (parallel/fsdp.py). Frees ~weights/(mesh size) HBM
    # per chip; GSPMD inserts the per-layer all-gathers over ICI.
    mesh.fsdp = False

    # ---- sampling ----
    config.sample = sample = ml_collections.ConfigDict()
    sample.num_steps = 4
    sample.eta = 1.0
    sample.guidance_scale = 0.0
    sample.batch_size = 4  # per host
    sample.num_batches_per_epoch = 4
    sample.resolution = 512

    # ---- training ----
    config.train = train = ml_collections.ConfigDict()
    train.lora_rank = 32
    train.distilled_train_steps = 3  # == sample.num_steps - 1
    train.batch_size = 4
    train.learning_rate = 1e-5
    train.adam_beta1 = 0.9
    train.adam_beta2 = 0.999
    train.adam_weight_decay = 1e-6
    train.adam_epsilon = 1e-8
    train.gradient_accumulation_steps = 2
    train.max_grad_norm = 1.0
    train.num_inner_epochs = 1
    train.beta = 50.0
    train.eps = 0.1
    # ratio-clamp flavor: "ratio" (reference parity) | "logratio" | "none"
    train.clamp_mode = "ratio"
    # bf16 Adam moments ~= the reference's 8-bit Adam memory saving
    train.optimizer_state_dtype = ""  # "" (fp32) | "bfloat16"
    # block-quantized int8-moment AdamW (bitsandbytes AdamW8bit parity)
    train.use_8bit_adam = False
    # fuse policy+reference passes into one 4x-batch apply. Measured on
    # v5e @512^2 (BENCHMARKS.md): UNFUSED wins — the fused pass drags the
    # grad-free reference half through backward+remat (update 8.2s vs
    # 5.3s, full loop 1.49 -> 2.05 pairs/s) — so False is the default.
    train.fuse_ref_pass = False
    # dynamic-int8 frozen-reference forward. MEASURED LOSS — keep off:
    # round-4 A/B (BENCHMARKS.md) showed -8.3% at 1024^2 and +2.0% at
    # 512^2 (inside the declared noise band); unlike int8_vae_decode
    # (+10%, a real win) this knob has no shape where it helps.
    train.int8_ref_pass = False

    # ---- kernels ----
    config.kernels = kernels = ml_collections.ConfigDict()
    kernels.attention_impl = "xla"  # global default: "xla" | "pallas" | "naive"
    # UNet-only override ("" = global default); UNet shapes favor pallas
    kernels.unet_attention_impl = ""
    # size-gated Pallas GroupNorm+SiLU. Module-isolated it wins on
    # decoder-scale activations (3.4 vs 3.9 ms) but in the full 512^2
    # program it costs ~3% (the custom call blocks XLA fusion around it;
    # BENCHMARKS.md headline matrix) — off by default, on for the
    # memory-tight 1024^2 DMD2 config.
    kernels.fused_groupnorm = False
    # subpixel rewrite of nearest-2x-upsample+conv (2.25x fewer FLOPs
    # isolated, but the depth-to-space interleave breaks conv fusion in
    # the 512^2 decoder: end-to-end it measures SLOWER — off by default)
    kernels.subpixel_upsample = False
    # dynamic-int8 VAE-decoder resnet convs (2x MXU rate): opt-in
    # throughput/accuracy trade for sampling-heavy runs; never the UNet
    kernels.int8_vae_decode = False
    # SmoothQuant outlier migration strength for the int8 decode
    # (0.0 = off; costs ~6% of the int8 headline — worth it only on
    # real checkpoints with channel-heteroscedastic GN affines)
    kernels.int8_smooth_alpha = 0.0
    # force the exact erf GELU under bf16 compute (strict torch-parity
    # runs; default tanh-under-bf16 is ~8% faster, models/layers.py)
    kernels.gelu_exact = False

    # ---- data ----
    # training prompts: a JSON list of {caption: ...} records, or "4k"
    # for the packaged reference set (4000 PickaPic captions,
    # data/assets/4k_training_prompts.json); "" = builtin smoke set
    config.prompt_json = ""
    config.prompt_fn = "simple_animals"  # legacy registry (unused by default)
    # reference-inert like the reference itself: its trainers instantiate
    # Selectors directly (:455-458); the runner hardwires PickScore too
    config.reward_fn = "pick_score"

    # ---- stat tracking (DDPO heritage; off for PSO) ----
    config.per_prompt_stat_tracking = ppst = ml_collections.ConfigDict()
    ppst.buffer_size = 16
    ppst.min_count = 16

    # ---- schema parity with the reference config (knobs its own PSO
    # trainers also parse but never consume; kept for drop-in override
    # compatibility of launch scripts) ----
    sample.eval_batch_size = 10
    sample.eval_epoch = 10
    sample.save_interval = 100
    train.timestep_fraction = 1.0
    train.adv_clip_max = 5
    train.clip_range = 1e-4
    train.save_interval = 100
    config.kl_ratio = 0.01

    return config

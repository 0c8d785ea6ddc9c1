"""SDXL pipeline bundle: models + tokenizers + schedules wired together.

The assembly layer the CLIs, bench, and eval build on. Unlike the
reference (which reloads a fresh diffusers pipeline from disk for every
validation pass, ``train_online_pso_sdxl_turbo.py:130-140``), the bundle
shares live HBM weights between training and generation — validation is
just another jitted call with the current LoRA.

Weight sources:
- ``SDXLPipeline.random(...)`` — architecture-true random init (throughput
  benches, compile checks, tests);
- ``SDXLPipeline.from_torch_dir(...)`` — port a local diffusers-layout
  checkpoint directory via ``checkpoints.convert`` (no network I/O).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from .checkpoints.convert import (
    load_torch_state_dict,
    refresh_dora_magnitudes,
    reinit_lora_a,
    torch_to_flax,
)
from .checkpoints.torch_names import (
    clip_text_param_map,
    unet_param_map,
    vae_param_map,
)
from .data.tokenizer import CLIPTokenizer
from .models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextTower,
    SDXLUNet,
    UNetConfig,
    VAEConfig,
)
from .models.sdxl_text import compute_time_ids, encode_sdxl_prompt
from .ops.schedules import (
    distill_timesteps,
    make_alphas_cumprod,
    make_euler_ancestral_schedule,
)
from .train.sampling import sample_dmd_trajectories, sample_turbo_trajectories


@dataclasses.dataclass
class SDXLPipeline:
    unet_config: UNetConfig
    unet: SDXLUNet
    unet_variables: dict
    vae: AutoencoderKL
    vae_variables: dict
    te1: Optional[CLIPTextTower] = None
    te1_variables: Optional[dict] = None
    te2: Optional[CLIPTextTower] = None
    te2_variables: Optional[dict] = None
    tokenizer_one: Optional[CLIPTokenizer] = None
    tokenizer_two: Optional[CLIPTokenizer] = None
    resolution: int = 512
    # decode this many images at a time (0 = whole batch); bounds the VAE
    # decoder's activation peak at 1024^2
    decode_chunk: int = 0

    @property
    def latent_downscale(self) -> int:
        """Spatial ratio image->latent from the VAE depth (8 for SDXL)."""
        return 2 ** (len(self.vae.config.block_out_channels) - 1)

    @property
    def latent_hw(self) -> int:
        return self.resolution // self.latent_downscale

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #

    @classmethod
    def random(
        cls,
        lora_rank: int = 0,
        dtype=jnp.bfloat16,
        resolution: int = 512,
        with_text_encoders: bool = True,
        tiny: bool = False,
        bpe_path: str = "",
        key: Optional[jax.Array] = None,
        fast_init: bool = False,
        param_dtype=None,
        remat: bool | str = False,
        unet_attention_impl: str | None = None,
        te_lora_rank: int = 0,
        use_dora: bool = False,
    ) -> "SDXLPipeline":
        """``fast_init=True`` fills params with zeros from eval_shape instead
        of compiling the (huge) random-init program — seconds instead of
        minutes for the 2.6B UNet. Use for throughput benches and compile
        checks; values are irrelevant there.

        ``param_dtype``: storage dtype for frozen tower weights. Default
        fp32; pass ``jnp.bfloat16`` for inference/bench (the reference
        samples with fp16 weights) — the full SDXL + CLIP-H weight set
        must be half precision to fit a 16 GB v5e chip.
        """
        key = key if key is not None else jax.random.key(0)
        ks = jax.random.split(key, 4)
        pd = {} if param_dtype is None else {"param_dtype": param_dtype}

        def init_fn(module):
            if not fast_init:
                return module.init

            def zeros_init(rng, *args, **kwargs):
                from .utils.init import zeros_from_shapes

                # one jitted program for the whole tree: per-leaf jnp.zeros
                # would be ~2000 separate dispatches, each paying the axon
                # tunnel RTT (~25 ms) — measured 200s of the bench startup
                shapes = jax.eval_shape(lambda: module.init(rng, *args, **kwargs))
                return zeros_from_shapes(shapes)

            return zeros_init
        if tiny:
            ucfg = UNetConfig.tiny(lora_rank=lora_rank)
            vcfg = VAEConfig.tiny()
            # TE widths sum to the UNet cross-attention dim (16+16=32);
            # TE2 projection matches the pooled-embed dim (16)
            t1cfg = dataclasses.replace(CLIPTextConfig.tiny(), width=16, heads=2)
            t2cfg = dataclasses.replace(
                CLIPTextConfig.tiny(), width=16, projection_dim=16, heads=2
            )
        else:
            ucfg = dataclasses.replace(
                UNetConfig.sdxl(lora_rank=lora_rank, dtype=dtype), **pd
            )
            vcfg = dataclasses.replace(VAEConfig.sdxl(), dtype=dtype, **pd)
            t1cfg = dataclasses.replace(CLIPTextConfig.sdxl_te1(dtype=dtype), **pd)
            t2cfg = dataclasses.replace(CLIPTextConfig.sdxl_te2(dtype=dtype), **pd)
        if remat:
            ucfg = dataclasses.replace(ucfg, remat=remat)
        if unet_attention_impl:
            ucfg = dataclasses.replace(ucfg, attention_impl=unet_attention_impl)
        if te_lora_rank:
            # TE LoRA training (ref --train_text_encoder, dreambooth :1330-1339)
            t1cfg = dataclasses.replace(t1cfg, lora_rank=te_lora_rank)
            t2cfg = dataclasses.replace(t2cfg, lora_rank=te_lora_rank)
        if use_dora:  # peft use_dora (ref dreambooth :741,1321,1333)
            ucfg = dataclasses.replace(ucfg, lora_use_dora=True)
            t1cfg = dataclasses.replace(t1cfg, lora_use_dora=True)
            t2cfg = dataclasses.replace(t2cfg, lora_use_dora=True)

        # latent size from the VAE depth (matches the latent_downscale
        # property; 8 for SDXL's 4-level VAE, 2^(levels-1) in general)
        latent_hw = resolution // (2 ** (len(vcfg.block_out_channels) - 1))
        unet = SDXLUNet(ucfg)
        unet_vars = init_fn(unet)(
            ks[0],
            jnp.zeros((1, latent_hw, latent_hw, ucfg.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, ucfg.cross_attention_dim)),
            jnp.zeros((1, ucfg.pooled_embed_dim)),
            jnp.zeros((1, 6)),
        )
        vae = AutoencoderKL(vcfg)
        vae_init_hw = 2 ** (len(vcfg.block_out_channels) + 2)
        vae_vars = init_fn(vae)(
            ks[1], jnp.zeros((1, vae_init_hw, vae_init_hw, 3)), ks[1]
        )
        te1 = te2 = te1_vars = te2_vars = tok1 = tok2 = None
        if with_text_encoders:
            te1 = CLIPTextTower(t1cfg)
            te1_vars = init_fn(te1)(ks[2], jnp.zeros((1, 77), jnp.int32))
            te2 = CLIPTextTower(t2cfg)
            te2_vars = init_fn(te2)(ks[3], jnp.zeros((1, 77), jnp.int32))
            if bpe_path and os.path.exists(bpe_path):
                tok1 = CLIPTokenizer(bpe_path)
                tok2 = CLIPTokenizer(bpe_path, pad_token_id=0)
        return cls(
            unet_config=ucfg,
            unet=unet,
            unet_variables=unet_vars,
            vae=vae,
            vae_variables=vae_vars,
            te1=te1,
            te1_variables=te1_vars,
            te2=te2,
            te2_variables=te2_vars,
            tokenizer_one=tok1,
            tokenizer_two=tok2,
            resolution=resolution,
        )

    @classmethod
    def from_torch_dir(
        cls,
        model_dir: str,
        lora_rank: int = 0,
        dtype=jnp.bfloat16,
        resolution: int = 512,
        bpe_path: str = "",
        key: Optional[jax.Array] = None,
        tiny: bool = False,
        param_dtype=None,
        remat: bool | str = False,
        te_lora_rank: int = 0,
        use_dora: bool = False,
        unet_attention_impl: str | None = None,
    ) -> "SDXLPipeline":
        """Port a local diffusers checkpoint directory (unet/, vae/,
        text_encoder/, text_encoder_2/ with .safetensors or .bin files).

        Towers are zero-filled via eval_shape (``fast_init``) since the
        strict port replaces every params leaf anyway — the full random
        init of the 2.6B UNet costs minutes on the 1-core host; LoRA
        ``a`` leaves are then re-randomized (a zeros-init adapter would
        be permanently gradient-dead) and DoRA magnitudes re-derived
        from the PORTED kernels."""
        pipe = cls.random(
            lora_rank=lora_rank,
            dtype=dtype,
            resolution=resolution,
            bpe_path=bpe_path,
            key=key,
            tiny=tiny,
            param_dtype=param_dtype,
            remat=remat,
            te_lora_rank=te_lora_rank,
            use_dora=use_dora,
            unet_attention_impl=unet_attention_impl,
            fast_init=True,
        )
        n_unet_levels = len(pipe.unet_config.block_out_channels)
        n_vae_levels = len(pipe.vae.config.block_out_channels)

        def find_weights(sub):
            d = os.path.join(model_dir, sub)
            if not os.path.isdir(d):
                return None
            for name in sorted(os.listdir(d)):
                if name.endswith((".safetensors", ".bin")):
                    return os.path.join(d, name)
            return None

        loads = [
            (
                "unet",
                pipe.unet_variables,
                functools.partial(unet_param_map, n_levels=n_unet_levels),
            ),
            (
                "vae",
                pipe.vae_variables,
                functools.partial(vae_param_map, n_levels=n_vae_levels),
            ),
            ("text_encoder", pipe.te1_variables, clip_text_param_map),
            ("text_encoder_2", pipe.te2_variables, clip_text_param_map),
        ]
        lora_key = jax.random.fold_in(
            key if key is not None else jax.random.key(0), 17
        )
        for i, (sub, variables, nm) in enumerate(loads):
            path = find_weights(sub)
            if path is None or variables is None:
                continue
            sd = load_torch_state_dict(path)
            params, _ = torch_to_flax(sd, variables["params"], nm, strict=True)
            variables["params"] = params
            if "lora" in variables:
                variables["lora"] = reinit_lora_a(
                    variables["lora"], jax.random.fold_in(lora_key, i)
                )
            if use_dora and "lora" in variables:
                # DoRA magnitudes were initialized from the RANDOM kernels
                # at init time; refresh to ||W_loaded||_col so the adapter
                # is a no-op at step 0 (peft initializes magnitude from
                # the pretrained weight)
                variables["lora"] = refresh_dora_magnitudes(
                    variables["params"], variables["lora"]
                )
        return pipe

    # ------------------------------------------------------------------ #
    # glue for the trainers / generation
    # ------------------------------------------------------------------ #

    def unet_apply(self, variables, x, t, cond, lora_scale):
        """Adapter with the OnlinePSOTrainer calling convention."""
        return self.unet.apply(
            variables,
            x,
            t,
            cond["embeds"],
            cond["pooled"],
            cond["time_ids"],
            lora_scale=lora_scale,
        )

    def encode_prompt(self, input_ids_one, input_ids_two):
        return self.encode_prompt_v(
            self.te1_variables, self.te2_variables, input_ids_one, input_ids_two
        )

    def encode_prompt_v(self, te1_variables, te2_variables, input_ids_one, input_ids_two):
        """Explicit-variables variant for composing jitted programs: the
        TE weights enter as jit ARGUMENTS — ``jax.jit(self.encode_prompt)``
        would bake the (GB-scale) towers into the executable as constants."""
        embeds, pooled = encode_sdxl_prompt(
            self.te1,
            te1_variables,
            self.te2,
            te2_variables,
            input_ids_one,
            input_ids_two,
        )
        time_ids = compute_time_ids(embeds.shape[0], self.resolution)
        return {"embeds": embeds, "pooled": pooled, "time_ids": time_ids}

    def decode(self, latents, vae_variables=None):
        """Pass ``vae_variables`` explicitly when composing jitted programs —
        a closure capture would bake the (GB-scale) weights into the
        executable as constants."""
        vv = vae_variables if vae_variables is not None else self.vae_variables
        if self.decode_chunk and latents.shape[0] > self.decode_chunk:
            assert latents.shape[0] % self.decode_chunk == 0, (
                latents.shape[0], self.decode_chunk,
            )
            chunks = latents.reshape(
                (-1, self.decode_chunk) + latents.shape[1:]
            )
            images = jax.lax.map(
                lambda z: self.vae.apply(vv, z, method=self.vae.decode),
                chunks,
            )
            return images.reshape((-1,) + images.shape[2:])
        return self.vae.apply(vv, latents, method=self.vae.decode)

    def generate(
        self,
        cond: dict,
        key: jax.Array,
        num_steps: int = 4,
        lora_scale: float = 1.0,
        unet_variables=None,
        vae_variables=None,
    ):
        """Turbo txt2img: returns images in [-1, 1], (B, H, W, 3).

        ``unet_variables``/``vae_variables`` override the bundle's weights;
        pass them as jit arguments (e.g. the live train-state LoRA) instead
        of mutating the bundle at trace time.
        """
        schedule = make_euler_ancestral_schedule(num_steps)
        b = cond["embeds"].shape[0]
        hw = self.latent_hw
        uv = unet_variables if unet_variables is not None else self.unet_variables
        k_init, k_traj = jax.random.split(key)
        init = jax.random.normal(
            k_init, (b, hw, hw, self.unet_config.in_channels), jnp.float32
        )

        def eps_fn(x, t):
            return self.unet_apply(uv, x, t, cond, lora_scale)

        traj = sample_turbo_trajectories(eps_fn, schedule, init, k_traj)
        return self.decode(traj.final_latents, vae_variables)

    def generate_dmd(
        self,
        cond: dict,
        key: Optional[jax.Array],
        num_steps: int = 4,
        lora_scale: float = 1.0,
        shared_noise: bool = True,
        unet_variables=None,
        vae_variables=None,
        sample_keys: Optional[jax.Array] = None,
    ):
        """DMD2 txt2img on the fixed lattice (e.g. [999,749,499,249]),
        guidance 0 — the reference eval protocol (``evaluate_sdxl_dmd2.py``).

        ``sample_keys`` (B,) keys make every sample's noise (init +
        transitions) a function of ITS key only — the eval CLI keys each
        prompt by global index, so multi-process sharded evaluation is
        bit-identical to a single-process run (``key``/``shared_noise``
        are ignored then)."""
        timesteps = jnp.asarray(distill_timesteps(num_steps))
        alphas_cumprod = make_alphas_cumprod()
        b = cond["embeds"].shape[0]
        hw = self.latent_hw
        c = self.unet_config.in_channels
        uv = unet_variables if unet_variables is not None else self.unet_variables
        if sample_keys is not None:
            init = jax.vmap(
                lambda k: jax.random.normal(
                    jax.random.fold_in(k, 0), (hw, hw, c), jnp.float32
                )
            )(sample_keys)
            trans = jax.vmap(
                lambda k: jax.vmap(
                    lambda i: jax.random.normal(
                        jax.random.fold_in(k, 1 + i), (hw, hw, c), jnp.float32
                    )
                )(jnp.arange(num_steps - 1))
            )(sample_keys)  # (B, S-1, h, w, c)
            trans = jnp.moveaxis(trans, 0, 1)
            k_traj = jax.random.key(0)  # unused (explicit noise)
        else:
            k_init, k_traj = jax.random.split(key)
            init = jax.random.normal(k_init, (b, hw, hw, c), jnp.float32)
            trans = None

        def eps_fn(x, t):
            return self.unet_apply(uv, x, t, cond, lora_scale)

        traj = sample_dmd_trajectories(
            eps_fn, alphas_cumprod, timesteps, init, k_traj,
            shared_noise=shared_noise, transition_noise=trans,
        )
        return self.decode(traj.final_latents, vae_variables)

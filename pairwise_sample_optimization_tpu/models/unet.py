"""SDXL UNet2DCondition in Flax (NHWC, bf16, LoRA-aware attention).

Config-driven re-implementation of the denoiser used by both SDXL-Turbo and
SDXL-DMD2 in the reference (loaded via
``UNet2DConditionModel.from_pretrained``, reference
``train_online_pso_sdxl_turbo.py:290-294`` / DMD2 state-dict load
``train_online_pso_sdxl_dmd2.py:311-317``). Structure:

conv_in -> [DownBlock, CrossAttnDown(d=2), CrossAttnDown(d=10)]
        -> Mid(CrossAttn, d=10)
        -> [CrossAttnUp(d=10), CrossAttnUp(d=2), UpBlock]  -> conv_out

with SDXL "text_time" micro-conditioning: pooled text embed (1280) +
six sinusoidally-embedded add_time_ids (6 x 256) joined into a 2816-dim
vector, MLP'd and added to the timestep embedding.

``lora_scale`` threads to every attention q/k/v/out projection; the DPO
reference model is ``lora_scale=0`` on the same parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (
    Downsample,
    GroupNorm,
    ResnetBlock,
    SpatialTransformer,
    TimestepEmbedMLP,
    Upsample,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    # attention depth per level; 0 = plain (no-attention) block
    transformer_layers: Tuple[int, ...] = (0, 2, 10)
    # mid-block attention depth; None = transformer_layers[-1] (SDXL);
    # SD1.x has an attention-free last level but an attending mid block
    mid_transformer_layers: int | None = None
    layers_per_block: int = 2
    head_dim: int = 64
    # SD1.x convention: fixed head COUNT with varying head_dim (ch/heads);
    # None = fixed head_dim (SDXL convention)
    fixed_num_heads: int | None = None
    cross_attention_dim: int = 2048
    # SDXL "text_time" micro-conditioning; False = SD1.x (no add embeds)
    use_text_time: bool = True
    addition_time_embed_dim: int = 256
    # pooled text-embedding width feeding the text_time embedding
    pooled_embed_dim: int = 1280
    num_time_ids: int = 6
    norm_groups: int = 32
    lora_rank: int = 0
    # weight-decomposed LoRA on the adapted projections (peft use_dora,
    # reference ``train_pso_sdxl_turbo_dreambooth.py:741,1321``)
    lora_use_dora: bool = False
    # attention implementation for THIS model's transformer blocks;
    # None = global dispatch default. The UNet's shapes (seq 256-4096,
    # d64) favor the Pallas kernel fwd+bwd; VAE/CLIP stay on XLA.
    attention_impl: str | None = None
    # rematerialize blocks in the backward pass (the reference's
    # enable_gradient_checkpointing, ref ``:358``) — trades FLOPs for
    # activation memory; essential for 1024^2 training.
    # False/"none" = off; True/"full" = resnets+transformers;
    # "resnets" = selective (frees the large conv maps, keeps attention
    # activations — 512^2 no-remat misses a 16GB chip by ~63MB);
    # "dots" = remat every block under the dots_with_no_batch_dims
    # policy (weight-matmul outputs saved, elementwise/attention
    # recomputed — near-no-remat FLOPs at a fraction of the memory);
    # "lowres" = full remat at the high-resolution levels only (where
    # the activation maps are large and the FLOPs small), none at the
    # FLOP-dominant lowest level + mid;
    # "lowres_dots" = full remat at high-res levels, dots policy at the
    # lowest level + mid.
    remat: bool | str = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    def heads_for(self, channels: int) -> tuple[int, int]:
        if self.fixed_num_heads is not None:
            return self.fixed_num_heads, channels // self.fixed_num_heads
        return channels // self.head_dim, self.head_dim

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @property
    def add_embed_input_dim(self) -> int:
        return self.pooled_embed_dim + self.num_time_ids * self.addition_time_embed_dim

    @staticmethod
    def sdxl(lora_rank: int = 0, dtype=jnp.bfloat16) -> "UNetConfig":
        """Full SDXL (Turbo / DMD2 share this architecture; 2.6B params)."""
        return UNetConfig(lora_rank=lora_rank, dtype=dtype)

    @staticmethod
    def sd15(lora_rank: int = 0, dtype=jnp.bfloat16) -> "UNetConfig":
        """SD1.x family (the reference's legacy D3PO/DDPO pipeline path):
        4 levels, single-depth transformers, 8 fixed heads, 768 cross dim,
        no micro-conditioning (~860M params)."""
        return UNetConfig(
            block_out_channels=(320, 640, 1280, 1280),
            transformer_layers=(1, 1, 1, 0),
            fixed_num_heads=8,
            cross_attention_dim=768,
            mid_transformer_layers=1,
            use_text_time=False,
            lora_rank=lora_rank,
            dtype=dtype,
        )

    @staticmethod
    def tiny(lora_rank: int = 0, dtype=jnp.float32) -> "UNetConfig":
        """2-level toy config for CPU tests of the full training loop."""
        return UNetConfig(
            block_out_channels=(32, 64),
            transformer_layers=(0, 1),
            layers_per_block=1,
            head_dim=8,
            cross_attention_dim=32,
            addition_time_embed_dim=8,
            pooled_embed_dim=16,
            norm_groups=8,
            lora_rank=lora_rank,
            dtype=dtype,
        )


class SDXLUNet(nn.Module):
    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, H, W, C) latents (already input-scaled)
        timesteps: jnp.ndarray,  # (B,) int/float
        encoder_hidden_states: jnp.ndarray,  # (B, 77*?, cross_attention_dim)
        pooled_text_embeds: jnp.ndarray | None = None,  # (B, pooled_embed_dim)
        add_time_ids: jnp.ndarray | None = None,  # (B, num_time_ids)
        lora_scale: jnp.ndarray | float = 1.0,
    ) -> jnp.ndarray:
        cfg = self.config
        dt, pdt = cfg.dtype, cfg.param_dtype
        n_levels = len(cfg.block_out_channels)

        # --- time + micro-conditioning embeddings ---
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedMLP(cfg.time_embed_dim, dtype=dt, param_dtype=pdt, name="time_embedding")(
            t_emb.astype(dt)
        )
        if cfg.use_text_time:
            if pooled_text_embeds is None or add_time_ids is None:
                raise ValueError("text_time conditioning needs pooled + time_ids")
            ids_emb = timestep_embedding(
                add_time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(add_time_ids.shape[0], -1)
            add_embeds = jnp.concatenate(
                [pooled_text_embeds.astype(jnp.float32), ids_emb], axis=-1
            )
            temb = temb + TimestepEmbedMLP(
                cfg.time_embed_dim, dtype=dt, param_dtype=pdt, name="add_embedding"
            )(add_embeds.astype(dt))

        context = encoder_hidden_states.astype(dt)

        # Per-level remat mode resolution (see UNetConfig.remat). Levels
        # are indexed by channel-stage; "mid" shares the lowest level's
        # decision. Each mode maps a position to one of
        # {None, "full", "resnets-only", "dots"}.
        _dots_policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable

        def _mode_at(level: int) -> tuple[bool, bool, object]:
            """-> (remat_resnet, remat_attn, policy-or-None) at `level`."""
            m = cfg.remat
            if m in (False, None, "none"):
                return False, False, None
            if m in (True, "full"):
                return True, True, None
            if m == "resnets":
                return True, False, None
            if m == "dots":
                return True, True, _dots_policy
            lowres = level == n_levels - 1
            if m == "lowres":
                return (not lowres), (not lowres), None
            if m == "lowres_dots":
                return True, True, (_dots_policy if lowres else None)
            raise ValueError(f"unknown remat mode: {m!r}")

        def _classes_at(level: int):
            r_res, r_attn, policy = _mode_at(level)
            res_cls = (
                nn.remat(ResnetBlock, policy=policy) if r_res else ResnetBlock
            )
            tr_cls = (
                nn.remat(SpatialTransformer, static_argnums=(), policy=policy)
                if r_attn
                else SpatialTransformer
            )
            return res_cls, tr_cls

        def resnet(ch, name, level):
            cls = _classes_at(level)[0]
            return cls(
                ch, groups=cfg.norm_groups, dtype=dt, param_dtype=pdt, name=name
            )

        def transformer(depth, ch, name, level):
            heads, head_dim = cfg.heads_for(ch)
            cls = _classes_at(level)[1]
            return cls(
                depth=depth,
                heads=heads,
                head_dim=head_dim,
                lora_rank=cfg.lora_rank,
                use_dora=cfg.lora_use_dora,
                groups=cfg.norm_groups,
                attention_impl=cfg.attention_impl,
                dtype=dt,
                param_dtype=pdt,
                name=name,
            )

        # --- down ---
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, param_dtype=pdt, name="conv_in",
        )(sample.astype(dt))
        skips = [h]
        for level, ch in enumerate(cfg.block_out_channels):
            depth = cfg.transformer_layers[level]
            for i in range(cfg.layers_per_block):
                h = resnet(ch, f"down_{level}_resnet_{i}", level)(h, temb)
                if depth:
                    h = transformer(depth, ch, f"down_{level}_attn_{i}", level)(
                        h, context, lora_scale
                    )
                skips.append(h)
            if level < n_levels - 1:
                h = Downsample(ch, dtype=dt, param_dtype=pdt, name=f"down_{level}_downsample")(h)
                skips.append(h)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        mid_depth = (
            cfg.mid_transformer_layers
            if cfg.mid_transformer_layers is not None
            else cfg.transformer_layers[-1]
        )
        h = resnet(mid_ch, "mid_resnet_0", n_levels - 1)(h, temb)
        if mid_depth:
            h = transformer(mid_depth, mid_ch, "mid_attn", n_levels - 1)(
                h, context, lora_scale
            )
        h = resnet(mid_ch, "mid_resnet_1", n_levels - 1)(h, temb)

        # --- up ---
        for rev, ch in enumerate(reversed(cfg.block_out_channels)):
            level = n_levels - 1 - rev
            depth = cfg.transformer_layers[level]
            for i in range(cfg.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = resnet(ch, f"up_{level}_resnet_{i}", level)(h, temb)
                if depth:
                    h = transformer(depth, ch, f"up_{level}_attn_{i}", level)(
                        h, context, lora_scale
                    )
            if level > 0:
                h = Upsample(ch, dtype=dt, param_dtype=pdt, name=f"up_{level}_upsample")(h)

        # --- out ---
        h = GroupNorm(cfg.norm_groups, act="silu", param_dtype=pdt, name="conv_norm_out")(h)
        h = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, param_dtype=pdt, name="conv_out",
        )(h)
        return h.astype(jnp.float32)

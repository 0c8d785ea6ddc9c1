"""AutoencoderKL (SDXL VAE) in Flax NHWC.

Covers both directions the reference uses: ``vae.decode`` on the sampling
path (reference ``sdxl_turbo_with_logprob.py:152-157``) and ``vae.encode``
for DreamBooth latents (``train_pso_sdxl_turbo_dreambooth.py:1750-1760``).
Decode runs in fp32 by default (the reference keeps the VAE fp32 to avoid
NaNs, ``train_online_pso_sdxl_turbo.py:317-321``) — use the fp16-fix VAE
weights with bf16 for speed.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import Downsample, GroupNorm, ResnetBlock, Upsample
from ..ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.13025
    # decoder resnet 3x3 convs may use the dynamic-int8 path when
    # ops.qconv is enabled (opt-in throughput mode; encoder never)
    decoder_allow_int8: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def sdxl(dtype=jnp.float32) -> "VAEConfig":
        return VAEConfig(dtype=dtype)

    @staticmethod
    def tiny(dtype=jnp.float32) -> "VAEConfig":
        return VAEConfig(
            block_out_channels=(16, 32), layers_per_block=1, norm_groups=8, dtype=dtype
        )


class VAEAttention(nn.Module):
    """Single-head spatial self-attention of the VAE mid block."""

    groups: int
    dtype: jnp.dtype
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(self.groups, eps=1e-6, param_dtype=self.param_dtype, name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        q = dense("to_q")(x)[:, :, None, :]
        k = dense("to_k")(x)[:, :, None, :]
        v = dense("to_v")(x)[:, :, None, :]
        o = dot_product_attention(q, k, v)[:, :, 0, :]
        o = dense("to_out")(o)
        return o.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt, pdt = cfg.dtype, cfg.param_dtype
        n = len(cfg.block_out_channels)
        resnet = lambda ch, name: ResnetBlock(
            ch, use_time_emb=False, groups=cfg.norm_groups, eps=1e-6,
            dtype=dt, param_dtype=pdt, name=name,
        )
        h = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, param_dtype=pdt, name="conv_in",
        )(x.astype(dt))
        for level, ch in enumerate(cfg.block_out_channels):
            for i in range(cfg.layers_per_block):
                h = resnet(ch, f"down_{level}_resnet_{i}")(h)
            if level < n - 1:
                h = Downsample(
                    ch, pad=((0, 1), (0, 1)), dtype=dt, param_dtype=pdt,
                    name=f"down_{level}_downsample",
                )(h)
        mid = cfg.block_out_channels[-1]
        h = resnet(mid, "mid_resnet_0")(h)
        h = VAEAttention(cfg.norm_groups, dt, pdt, name="mid_attn")(h)
        h = resnet(mid, "mid_resnet_1")(h)
        h = GroupNorm(cfg.norm_groups, eps=1e-6, act="silu", param_dtype=pdt, name="conv_norm_out")(h)
        return nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, param_dtype=pdt, name="conv_out",
        )(h)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dt, pdt = cfg.dtype, cfg.param_dtype
        channels = list(reversed(cfg.block_out_channels))
        resnet = lambda ch, name: ResnetBlock(
            ch, use_time_emb=False, groups=cfg.norm_groups, eps=1e-6,
            allow_int8=cfg.decoder_allow_int8, dtype=dt, param_dtype=pdt,
            name=name,
        )
        h = nn.Conv(
            channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, param_dtype=pdt, name="conv_in",
        )(z.astype(dt))
        h = resnet(channels[0], "mid_resnet_0")(h)
        h = VAEAttention(cfg.norm_groups, dt, pdt, name="mid_attn")(h)
        h = resnet(channels[0], "mid_resnet_1")(h)
        for level, ch in enumerate(channels):
            for i in range(cfg.layers_per_block + 1):
                h = resnet(ch, f"up_{level}_resnet_{i}")(h)
            if level < len(channels) - 1:
                h = Upsample(
                    ch, allow_int8=cfg.decoder_allow_int8, dtype=dt,
                    param_dtype=pdt, name=f"up_{level}_upsample",
                )(h)
        h = GroupNorm(cfg.norm_groups, eps=1e-6, act="silu", param_dtype=pdt, name="conv_norm_out")(h)
        return nn.Conv(
            cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=dt, param_dtype=pdt, name="conv_out",
        )(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        self.quant_conv = nn.Conv(
            2 * cfg.latent_channels, (1, 1), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            cfg.latent_channels, (1, 1), dtype=cfg.dtype,
            param_dtype=cfg.param_dtype, name="post_quant_conv",
        )

    def encode(self, x):
        """(B,H,W,3) image in [-1,1] -> (mean, logvar) latents (B,h,w,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def sample_latents(self, x, key):
        """Encode and draw z ~ N(mean, var); scaled by scaling_factor."""
        mean, logvar = self.encode(x)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
        return z * self.config.scaling_factor

    def decode(self, z):
        """Scaled latents (B,h,w,4) -> image (B,H,W,3) in [-1,1]."""
        z = z / self.config.scaling_factor
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        return self.decode(self.sample_latents(x, key))

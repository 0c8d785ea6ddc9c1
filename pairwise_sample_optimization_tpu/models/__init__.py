from .unet import UNetConfig, SDXLUNet
from .vae import VAEConfig, AutoencoderKL
from .clip import (
    CLIPTextConfig,
    CLIPVisionConfig,
    CLIPTextTower,
    CLIPVisionTower,
    CLIPDualEncoder,
)

__all__ = [
    "UNetConfig",
    "SDXLUNet",
    "VAEConfig",
    "AutoencoderKL",
    "CLIPTextConfig",
    "CLIPVisionConfig",
    "CLIPTextTower",
    "CLIPVisionTower",
    "CLIPDualEncoder",
]

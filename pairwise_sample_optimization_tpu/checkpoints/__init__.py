from .orbax_io import save_train_state, restore_train_state, latest_checkpoint
from .torch_names import (
    unet_param_map,
    vae_param_map,
    clip_text_param_map,
    clip_vision_param_map,
    sequential_mlp_param_map,
    blip_vit_param_map,
    blip_bert_param_map,
)
from .convert import (
    refresh_dora_magnitudes,
    reinit_lora_a,
    torch_to_flax,
    flax_to_torch,
    load_torch_state_dict,
)
from .lora_safetensors import (
    export_lora_safetensors,
    export_sdxl_lora_safetensors,
    export_kohya_lora_safetensors,
    import_lora_safetensors,
)
from .clip_loader import load_hf_clip_dual, openclip_to_hf_clip
from .scorer_loaders import (
    load_aesthetic_mlp,
    load_clip_vision,
    load_imagereward,
)

__all__ = [
    "save_train_state",
    "restore_train_state",
    "latest_checkpoint",
    "unet_param_map",
    "vae_param_map",
    "clip_text_param_map",
    "clip_vision_param_map",
    "refresh_dora_magnitudes",
    "reinit_lora_a",
    "torch_to_flax",
    "flax_to_torch",
    "load_torch_state_dict",
    "export_lora_safetensors",
    "export_sdxl_lora_safetensors",
    "export_kohya_lora_safetensors",
    "import_lora_safetensors",
    "load_hf_clip_dual",
    "openclip_to_hf_clip",
    "sequential_mlp_param_map",
    "blip_vit_param_map",
    "blip_bert_param_map",
    "load_aesthetic_mlp",
    "load_clip_vision",
    "load_imagereward",
]

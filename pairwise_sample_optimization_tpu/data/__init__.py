from .tokenizer import (
    CLIPTokenizer,
    HashTokenizer,
    DEFAULT_BPE_PATH,
    make_clip_tokenizers,
)
from .prompt_dataset import (
    PromptDataset,
    PromptLoader,
    imagereward_prompts_path,
    training_prompts_path,
)
from .prompts import PROMPT_FNS, get_prompt_fn
from .stat_tracking import PerPromptStatTracker

__all__ = [
    "CLIPTokenizer",
    "HashTokenizer",
    "DEFAULT_BPE_PATH",
    "make_clip_tokenizers",
    "PromptDataset",
    "imagereward_prompts_path",
    "training_prompts_path",
    "PromptLoader",
    "PROMPT_FNS",
    "get_prompt_fn",
    "PerPromptStatTracker",
]

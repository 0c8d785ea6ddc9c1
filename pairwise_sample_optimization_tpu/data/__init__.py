from .tokenizer import CLIPTokenizer, HashTokenizer, DEFAULT_BPE_PATH
from .prompt_dataset import PromptDataset, PromptLoader, training_prompts_path
from .prompts import PROMPT_FNS, get_prompt_fn
from .stat_tracking import PerPromptStatTracker

__all__ = [
    "CLIPTokenizer",
    "HashTokenizer",
    "DEFAULT_BPE_PATH",
    "PromptDataset",
    "training_prompts_path",
    "PromptLoader",
    "PROMPT_FNS",
    "get_prompt_fn",
    "PerPromptStatTracker",
]

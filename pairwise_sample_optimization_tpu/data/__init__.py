from .tokenizer import CLIPTokenizer, HashTokenizer, DEFAULT_BPE_PATH
from .prompt_dataset import PromptDataset, PromptLoader
from .prompts import PROMPT_FNS, get_prompt_fn
from .stat_tracking import PerPromptStatTracker

__all__ = [
    "CLIPTokenizer",
    "HashTokenizer",
    "DEFAULT_BPE_PATH",
    "PromptDataset",
    "PromptLoader",
    "PROMPT_FNS",
    "get_prompt_fn",
    "PerPromptStatTracker",
]

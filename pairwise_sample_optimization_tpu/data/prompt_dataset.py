"""Prompt dataset + batched loader.

Rebuild of reference ``pso_pytorch/prompt_dataset.py`` (4k PickaPic
training prompts, dual-tokenizer collate) without torch DataLoader
machinery: prompt batching is trivially CPU-bound, so a numpy-RNG
shuffled iterator that emits already-tokenized device-ready batches is
all the "data loader" this workload needs.

The prompt list is data: pass ``json_path`` to any JSON list of
``{caption: str, ...}`` records or a newline-delimited ``.txt``. The
reference's prompt assets ship with the package as protocol data:
``PromptDataset("4k")`` — the 4 000 PickaPic training captions
(``pso_pytorch/assets/4k_training_prompts.json``) — and
``PromptDataset("imagereward")`` — the 1000-prompt ImageReward benchmark
set (``pso_pytorch/assets/imagereward_prompt.txt``). A small built-in
prompt set keeps tests and benches self-contained when no path is
given.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import numpy as np

# self-contained fallback prompts (benches/tests without external assets)
_BUILTIN_PROMPTS = [
    "a photo of a corgi wearing sunglasses on a beach",
    "an oil painting of a lighthouse in a storm",
    "a futuristic city skyline at sunset, digital art",
    "a macro photograph of a dew-covered spider web",
    "a watercolor sketch of a red fox in the snow",
    "an astronaut riding a horse in photorealistic style",
    "a bowl of ramen with chopsticks, studio lighting",
    "a medieval castle on a cliff above the ocean",
    "a robot playing chess in a dimly lit room",
    "a field of sunflowers under a thunderstorm",
    "a portrait of an old sailor with a pipe, rembrandt lighting",
    "a glass terrarium containing a tiny rainforest",
    "a steam locomotive crossing a stone viaduct",
    "a neon-lit alley in tokyo at night in the rain",
    "a stack of pancakes with maple syrup and berries",
    "a hot air balloon festival over mountain valleys",
]


def training_prompts_path() -> str:
    """Packaged copy of the reference's 4k PickaPic training prompts."""
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets",
        "4k_training_prompts.json",
    )


def imagereward_prompts_path() -> str:
    """Packaged copy of the reference's 1000-prompt ImageReward benchmark
    set (``pso_pytorch/assets/imagereward_prompt.txt`` — shipped by the
    reference as protocol data; one prompt per line)."""
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "assets",
        "imagereward_prompt.txt",
    )


def _load_hf_prompts(source: str, split: Optional[str], caption_key: str):
    """Load prompts via HF ``datasets``: ``load_from_disk`` for a local
    export directory, ``load_dataset(name, split=...)`` otherwise."""
    import datasets as hf_datasets

    if os.path.isdir(source):
        ds = hf_datasets.load_from_disk(source)
        if not isinstance(ds, hf_datasets.Dataset):
            if split is None or split not in ds:
                raise KeyError(
                    f"{source} holds splits {list(ds)}; requested {split!r}"
                )
            ds = ds[split]
    else:
        ds = hf_datasets.load_dataset(source, split=split or "test_unique")
    return [str(x) for x in ds[caption_key]]


class PromptDataset:
    def __init__(
        self,
        json_path: Optional[str] = None,
        caption_key: str = "caption",
        split: Optional[str] = None,
        hf_dataset: Optional[str] = None,
    ):
        """``split`` selects a named split when the JSON is a dict of
        splits (the PickaPic ``test_unique`` export layout, reference
        ``split=config.val_split_name``); ignored for plain lists.

        ``hf_dataset``: a HuggingFace ``datasets`` source — either a hub
        name (the reference's ``yuvalkirstain/pickapic_v1_no_images``
        with ``split='test_unique'``, ``train_online_pso_sdxl_turbo.py
        :461-466``) or a local ``save_to_disk`` directory; requires
        network for hub names (this environment has none — pass a
        local export)."""
        _packaged = {"4k": training_prompts_path,
                     "imagereward": imagereward_prompts_path}
        if json_path in _packaged:  # packaged reference prompt sets
            json_path = _packaged[json_path]()
            if not os.path.exists(json_path):
                raise FileNotFoundError(
                    f"packaged prompt asset missing: {json_path} "
                    "(broken install — data/assets not packaged?)"
                )
        if hf_dataset:
            self.prompts = _load_hf_prompts(hf_dataset, split, caption_key)
        elif json_path and not os.path.exists(json_path):
            # an explicit path that does not resolve must NOT silently
            # train on the builtin smoke prompts — the prompt set is the
            # protocol
            raise FileNotFoundError(f"prompt json not found: {json_path!r}")
        elif json_path and json_path.endswith(".txt"):
            # newline-delimited prompt lists (the imagereward set's format)
            with open(json_path) as f:
                self.prompts = [ln.strip() for ln in f if ln.strip()]
        elif json_path:
            with open(json_path) as f:
                meta = json.load(f)
            if isinstance(meta, dict):
                if split is None or split not in meta:
                    raise KeyError(
                        f"{json_path} is a dict of splits {list(meta)}; "
                        f"requested split={split!r}"
                    )
                meta = meta[split]
            self.prompts = [
                m[caption_key] if isinstance(m, dict) else str(m) for m in meta
            ]
        else:
            self.prompts = list(_BUILTIN_PROMPTS)

    def __len__(self):
        return len(self.prompts)

    def __getitem__(self, idx: int) -> str:
        return self.prompts[idx]


class PromptLoader:
    """Shuffled epoch iterator emitting tokenized batches.

    Collate parity with ``sdxl_collate_fn``: each batch carries the raw
    prompts plus max-length-77 ids from both tokenizers (and optionally a
    reward tokenizer for on-device scoring).
    """

    def __init__(
        self,
        dataset: PromptDataset,
        batch_size: int,
        tokenizer_one,
        tokenizer_two=None,
        reward_tokenizer=None,
        seed: int = 0,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.tok1 = tokenizer_one
        self.tok2 = tokenizer_two
        self.tok_r = reward_tokenizer
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last

    def epoch(self) -> Iterator[dict]:
        order = self.rng.permutation(len(self.dataset))
        stop = (
            len(order) - self.batch_size + 1 if self.drop_last else len(order)
        )
        for start in range(0, max(stop, 0), self.batch_size):
            idx = order[start : start + self.batch_size]
            prompts = [self.dataset[int(i)] for i in idx]
            batch = {"prompts": prompts, "input_ids_one": self.tok1(prompts)}
            if self.tok2 is not None:
                batch["input_ids_two"] = self.tok2(prompts)
            if self.tok_r is not None:
                batch["reward_input_ids"] = self.tok_r(prompts)
            yield batch

    def __iter__(self):
        return self.epoch()

"""DreamBooth validation: the reference's fixed 25-prompt suite.

Reference ``personalization/train_pso_sdxl_turbo_dreambooth.py:157-293``
(``log_validation``): 25 DreamBooth prompts built from
``(unique_token, class_name)`` — object list or live-subject list — 4
images per prompt, 4-step guidance-0 generation, saved under
``<output_dir>/gen_<step>/p_{i:03d}/img_{j:02d}.png``.

TPU-native difference: generation batches all 4 samples of a prompt into
one jitted call on the live train-state weights (the reference reloads a
fresh pipeline per validation and loops single images).
"""

from __future__ import annotations

import os
from typing import Callable, List

import jax
import numpy as np

_SHARED = [
    "a {0} {1} in the jungle",
    "a {0} {1} in the snow",
    "a {0} {1} on the beach",
    "a {0} {1} on a cobblestone street",
    "a {0} {1} on top of pink fabric",
    "a {0} {1} on top of a wooden floor",
    "a {0} {1} with a city in the background",
    "a {0} {1} with a mountain in the background",
    "a {0} {1} with a blue house in the background",
    "a {0} {1} on top of a purple rug in a forest",
]
_OBJECT_ONLY = [
    "a {0} {1} with a wheat field in the background",
    "a {0} {1} with a tree and autumn leaves in the background",
    "a {0} {1} with the Eiffel Tower in the background",
    "a {0} {1} floating on top of water",
    "a {0} {1} floating in an ocean of milk",
    "a {0} {1} on top of green grass with sunflowers around it",
    "a {0} {1} on top of a mirror",
    "a {0} {1} on top of the sidewalk in a crowded street",
    "a {0} {1} on top of a dirt road",
    "a {0} {1} on top of a white rug",
]
_SUBJECT_ONLY = [
    "a {0} {1} wearing a red hat",
    "a {0} {1} wearing a santa hat",
    "a {0} {1} wearing a rainbow scarf",
    "a {0} {1} wearing a black top hat and a monocle",
    "a {0} {1} in a chef outfit",
    "a {0} {1} in a firefighter outfit",
    "a {0} {1} in a police outfit",
    "a {0} {1} wearing pink glasses",
    "a {0} {1} wearing a yellow shirt",
    "a {0} {1} in a purple wizard outfit",
]
_TAIL = [
    "a red {0} {1}",
    "a purple {0} {1}",
    "a shiny {0} {1}",
    "a wet {0} {1}",
    "a cube shaped {0} {1}",
]


def dreambooth_validation_prompts(
    unique_token: str, class_name: str, is_object: bool
) -> List[str]:
    """The reference's 25 fixed validation prompts (``:169-224``)."""
    mid = _OBJECT_ONLY if is_object else _SUBJECT_ONLY
    return [
        t.format(unique_token, class_name) for t in _SHARED + mid + _TAIL
    ]


def run_dreambooth_validation(
    generate_fn: Callable[[str, jax.Array, int], np.ndarray],
    prompts: List[str],
    output_dir: str,
    global_step: int,
    num_images_per_prompt: int = 4,
    seed: int = 0,
    metric_logger=None,
) -> str:
    """Generate and save the validation grid; returns the save root.

    ``generate_fn(prompt, key, n) -> (n, H, W, 3) images in [-1, 1]``.
    Layout parity with reference ``:275-283``:
    ``gen_<step>/p_001..p_025/img_01..img_04.png``. ``metric_logger``
    (a ``utils.MetricLogger``) additionally mirrors the grid to wandb
    with the reference's ``p_xxx/img_xx: <prompt>`` captions (``:263-268``).
    """
    from PIL import Image

    root = os.path.join(output_dir, f"gen_{global_step}")
    os.makedirs(root, exist_ok=True)
    key = jax.random.key(seed)
    all_imgs, captions = [], []
    for p_idx, prompt in enumerate(prompts, start=1):
        imgs = np.asarray(
            generate_fn(prompt, jax.random.fold_in(key, p_idx), num_images_per_prompt)
        )
        sub = os.path.join(root, f"p_{p_idx:03d}")
        os.makedirs(sub, exist_ok=True)
        u8 = ((np.clip(imgs, -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)
        for s_idx in range(u8.shape[0]):
            Image.fromarray(u8[s_idx]).save(
                os.path.join(sub, f"img_{s_idx + 1:02d}.png")
            )
            captions.append(f"p_{p_idx:03d}/img_{s_idx + 1:02d}: {prompt}")
        all_imgs.append(imgs)
    if metric_logger is not None:
        metric_logger.log_images(
            "validation", np.concatenate(all_imgs, 0), global_step, captions=captions
        )
    return root

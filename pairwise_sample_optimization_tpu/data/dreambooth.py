"""DreamBooth instance-image dataset + negative (loser) image pool.

Rebuild of the reference ``DreamBoothDataset``/``collate_fn``
(``train_pso_sdxl_turbo_dreambooth.py:828-1047``): loads the subject's
instance images, resizes/center-crops to the train resolution recording
SDXL micro-conditioning (original_size, crop_top_left), and batches
host-side as numpy for device upload. The negative pool holds
self-generated images from the pretrained model (``negative_sample``,
``:123-154``) and serves random loser picks per step.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img)


def _resize_crop(
    arr: np.ndarray, size: int, rng: "np.random.Generator | None" = None
) -> Tuple[np.ndarray, Tuple[int, int], Tuple[int, int]]:
    """-> (HxWx3 uint8, original_size, crop_top_left); PIL bicubic resize of
    the short side then crop (transforms parity). ``rng=None`` = center
    crop (reference ``--center_crop``); an rng = torchvision RandomCrop
    (the reference's default)."""
    from PIL import Image

    h0, w0 = arr.shape[:2]
    img = Image.fromarray(arr)
    scale = size / min(h0, w0)
    nh, nw = round(h0 * scale), round(w0 * scale)
    img = img.resize((nw, nh), Image.BICUBIC)
    if rng is None:
        top = (nh - size) // 2
        left = (nw - size) // 2
    else:
        top = int(rng.integers(0, nh - size + 1))
        left = int(rng.integers(0, nw - size + 1))
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img), (h0, w0), (top, left)


def _resize_center_crop(arr, size):
    return _resize_crop(arr, size, None)


def to_model_range(uint8_images: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (the VAE's input range)."""
    return uint8_images.astype(np.float32) / 127.5 - 1.0


class DreamBoothDataset:
    def __init__(
        self,
        instance_data_dir: str,
        instance_prompt: str,
        resolution: int = 512,
        repeats: int = 1,
        center_crop: bool = True,
        random_flip: bool = False,
        aug_pool: int = 8,
        seed: int = 0,
    ):
        """``center_crop=False`` emulates the reference's torchvision
        RandomCrop default and ``random_flip`` its RandomHorizontalFlip —
        as a PRECOMPUTED pool of ``aug_pool`` random-crop (x flip)
        variants per source image, so VAE moments are still encoded once
        and training steps stay host-transform-free (TPU-first design;
        ref transforms at ``train_pso_sdxl_turbo_dreambooth.py:966-975``)."""
        paths = sorted(
            os.path.join(instance_data_dir, f)
            for f in os.listdir(instance_data_dir)
            if f.lower().endswith(_IMG_EXTS)
        )
        if not paths:
            raise FileNotFoundError(f"no images in {instance_data_dir}")
        self.instance_prompt = instance_prompt
        self.resolution = resolution
        # logical dataset size for epoch math (augmentation variants are
        # views of the same source image, reference __len__ semantics)
        self.num_source = len(paths) * repeats
        self.pixel_values: List[np.ndarray] = []
        self.original_sizes: List[Tuple[int, int]] = []
        self.crop_top_lefts: List[Tuple[int, int]] = []
        rng = np.random.default_rng(seed)
        for p in paths * repeats:
            src = _load_image(p)
            # flip BEFORE crop (the reference transform order), so the
            # recorded crop_top_left is measured on the flipped image —
            # SDXL's micro-conditioning coordinates must match the view
            # the model actually sees
            sources = [src] + ([src[:, ::-1]] if random_flip else [])
            for s in sources:
                variants = (
                    [_resize_crop(s, resolution, None)]
                    if center_crop
                    else [_resize_crop(s, resolution, rng) for _ in range(aug_pool)]
                )
                for arr, orig, crop in variants:
                    self.pixel_values.append(
                        to_model_range(np.ascontiguousarray(arr))
                    )
                    self.original_sizes.append(orig)
                    self.crop_top_lefts.append(crop)

    def __len__(self):
        return len(self.pixel_values)

    def __getitem__(self, idx: int) -> dict:
        return {
            "pixel_values": self.pixel_values[idx],
            "prompt": self.instance_prompt,
            "original_size": self.original_sizes[idx],
            "crop_top_left": self.crop_top_lefts[idx],
        }

    def batches(self, batch_size: int, seed: int = 0):
        """Endless shuffled batch iterator (collate_fn parity)."""
        rng = np.random.default_rng(seed)
        while True:
            order = rng.permutation(len(self))
            for start in range(0, len(self) - batch_size + 1, batch_size):
                idx = order[start : start + batch_size]
                yield {
                    "pixel_values": np.stack([self.pixel_values[i] for i in idx]),
                    "prompts": [self.instance_prompt] * len(idx),
                    "original_sizes": [self.original_sizes[i] for i in idx],
                    "crop_top_lefts": [self.crop_top_lefts[i] for i in idx],
                }


class NegativePool:
    """Self-generated loser images; random picks per train step."""

    def __init__(self, images: np.ndarray, seed: int = 0):
        """images: (N, H, W, 3) float32 in [-1, 1]."""
        self.images = np.asarray(images)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.images)

    def sample(self, batch_size: int) -> np.ndarray:
        idx = self.rng.choice(len(self.images), batch_size, replace=False)
        return self.images[idx]

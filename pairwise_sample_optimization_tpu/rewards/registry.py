"""Reward-closure registry (parity with reference ``pso_pytorch/rewards.py``).

Each factory returns ``fn(images, prompt_ids, metadata) -> (scores, meta)``.
Device rewards (light/aesthetic/pick) are jitted on-device programs;
JPEG (in)compressibility is inherently a host codec reward and runs via
PIL on host — the one legitimate device->host boundary in the reward
stack, and it is eval/research-only (no trainer uses it).
"""

from __future__ import annotations

import io
from typing import Callable, Dict

import jax.numpy as jnp
import numpy as np


def light_reward():
    def _fn(images, prompt_ids=None, metadata=None):
        return jnp.mean(images.reshape(images.shape[0], -1), axis=1), {}

    return _fn


def jpeg_incompressibility():
    def _fn(images, prompt_ids=None, metadata=None):
        from PIL import Image

        arr = np.asarray(images)
        arr = ((arr + 1.0) * 127.5).round().clip(0, 255).astype(np.uint8)
        sizes = []
        for img in arr:
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=95)
            sizes.append(buf.tell() / 1000)
        return np.asarray(sizes), {}

    return _fn


def jpeg_compressibility():
    inner = jpeg_incompressibility()

    def _fn(images, prompt_ids=None, metadata=None):
        r, meta = inner(images, prompt_ids, metadata)
        return -r, meta

    return _fn


def aesthetic_score(scorer=None):
    from .aesthetic import AestheticScorer

    scorer = scorer or AestheticScorer()

    def _fn(images, prompt_ids=None, metadata=None):
        return scorer.score(images), {}

    return _fn


def pick_score(scorer=None):
    from .pickscore import PickScoreScorer

    scorer = scorer or PickScoreScorer()

    def _fn(images, prompt_ids, metadata=None):
        return scorer.score(images, prompt_ids), {}

    return _fn


REWARD_FNS: Dict[str, Callable] = {
    "light_reward": light_reward,
    "jpeg_incompressibility": jpeg_incompressibility,
    "jpeg_compressibility": jpeg_compressibility,
    "aesthetic_score": aesthetic_score,
    "pick_score": pick_score,
}


def get_reward_fn(name: str, **kwargs):
    if name not in REWARD_FNS:
        raise KeyError(f"unknown reward fn '{name}'; have {sorted(REWARD_FNS)}")
    return REWARD_FNS[name](**kwargs)

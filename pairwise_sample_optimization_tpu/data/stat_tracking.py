"""Per-prompt reward statistics -> advantages (DDPO-heritage utility).

Parity with reference ``pso_pytorch/stat_tracking.py``: a bounded
per-prompt reward buffer whose mean/std normalize new rewards into
advantages; prompts with fewer than ``min_count`` observations fall back
to batch statistics. Unused by the PSO losses (pairwise ranking replaces
advantages) but part of the library surface.
"""

from __future__ import annotations

from collections import deque

import numpy as np


class PerPromptStatTracker:
    def __init__(self, buffer_size: int = 16, min_count: int = 16):
        self.buffer_size = buffer_size
        self.min_count = min_count
        self.stats: dict[str, deque] = {}

    def update(self, prompts, rewards) -> np.ndarray:
        prompts = np.asarray(prompts)
        rewards = np.asarray(rewards, dtype=np.float64)
        advantages = np.empty_like(rewards)
        for prompt in np.unique(prompts):
            mask = prompts == prompt
            buf = self.stats.setdefault(prompt, deque(maxlen=self.buffer_size))
            buf.extend(rewards[mask])
            if len(buf) < self.min_count:
                mean, std = rewards.mean(), rewards.std() + 1e-6
            else:
                mean, std = np.mean(buf), np.std(buf) + 1e-6
            advantages[mask] = (rewards[mask] - mean) / std
        return advantages

    def get_stats(self):
        return {
            k: {"mean": float(np.mean(v)), "std": float(np.std(v)), "count": len(v)}
            for k, v in self.stats.items()
        }

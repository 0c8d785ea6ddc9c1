"""Per-prompt reward statistics -> advantages (DDPO-heritage utility).

Semantics contract with reference ``pso_pytorch/stat_tracking.py:5-36``
(the 36-line utility is its own spec): keep the most recent
``buffer_size`` rewards per prompt; normalize each batch's rewards by
the post-update buffer mean/std of their prompt; prompts with fewer
than ``min_count`` observations fall back to the current batch's own
statistics; the std gets a ``+1e-6`` floor after computation. Unused by
the PSO losses (pairwise ranking replaces advantages) but part of the
library surface.

Implementation here is a fixed-capacity numpy ring buffer per prompt
(vectorized writes, O(1) memory churn) rather than the reference's
``deque``-of-floats — same observable behavior, different machinery.
"""

from __future__ import annotations

import numpy as np


class _RingBuffer:
    """Fixed-capacity float64 ring holding the most recent values."""

    __slots__ = ("data", "head", "count")

    def __init__(self, capacity: int):
        self.data = np.empty(capacity, dtype=np.float64)
        self.head = 0  # next write slot
        self.count = 0  # total values ever written

    def extend(self, values: np.ndarray) -> None:
        cap = self.data.shape[0]
        n = values.shape[0]
        if n >= cap:
            # only the newest `cap` values survive; reset phase to 0
            self.data[:] = values[-cap:]
            self.head = 0
        else:
            slots = (self.head + np.arange(n)) % cap
            self.data[slots] = values
            self.head = (self.head + n) % cap
        self.count += n

    def valid(self) -> np.ndarray:
        return self.data[: min(self.count, self.data.shape[0])]

    def __len__(self) -> int:
        return min(self.count, self.data.shape[0])


class PerPromptStatTracker:
    def __init__(self, buffer_size: int = 16, min_count: int = 16):
        self.buffer_size = buffer_size
        self.min_count = min_count
        self.stats: dict[str, _RingBuffer] = {}

    def update(self, prompts, rewards) -> np.ndarray:
        prompts = np.asarray(prompts)
        rewards_in = np.asarray(rewards)
        rewards = rewards_in.astype(np.float64)
        batch_mean = rewards.mean()
        batch_std = rewards.std() + 1e-6
        # advantages come back in the CALLER's dtype (reference
        # np.empty_like semantics); stats accumulate in f64 internally
        advantages = np.empty_like(rewards_in)
        for prompt in np.unique(prompts):
            mask = prompts == prompt
            ring = self.stats.get(prompt)
            if ring is None:
                ring = self.stats[prompt] = _RingBuffer(self.buffer_size)
            ring.extend(rewards[mask])
            if len(ring) < self.min_count:
                mean, std = batch_mean, batch_std
            else:
                window = ring.valid()
                mean, std = window.mean(), window.std() + 1e-6
            advantages[mask] = (rewards[mask] - mean) / std
        return advantages

    def get_stats(self):
        return {
            k: {
                "mean": float(v.valid().mean()),
                "std": float(v.valid().std()),
                "count": len(v),
            }
            for k, v in self.stats.items()
        }

"""Phase timing + jax.profiler hooks (the reference has none; SURVEY §5
makes per-phase step timers first-class metrics for the TPU build)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


def _readback_sync(tree) -> None:
    """Synchronize on device work via VALUE READBACK of one leaf: through
    the axon tunnel ``jax.block_until_ready`` can return before execution
    completes — only readback reliably syncs (CLAUDE.md timing gotcha).
    Falls back to block_until_ready for non-addressable (multi-host
    global) arrays, where a readback would need a collective."""
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "is_fully_addressable") and not leaf.is_fully_addressable:
            jax.block_until_ready(leaf)
        elif hasattr(leaf, "ndim"):
            # ONE-element readback: a full-array np.asarray ships the
            # whole buffer through the tunnel and corrupts the timing
            np.asarray(leaf[(0,) * leaf.ndim])
        else:
            jax.block_until_ready(leaf)
        return  # one leaf is enough: programs complete in dispatch order
    return


class PhaseTimer:
    """Accumulates wall-time per named phase (sample / reward / update)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                _readback_sync(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            f"time/{k}_s": self.totals[k] / max(self.counts[k], 1)
            for k in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace_annotation(name: str):
    """jax.profiler annotation; shows up in TensorBoard/XProf traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str | None):
    """Capture a device trace for this block when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

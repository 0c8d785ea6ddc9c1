"""Orbax checkpointing for PSO train state — with resume actually wired.

The reference defines ``config.resume_from`` and
``--resume_from_checkpoint`` but neither is connected to the training
loops (``config_sdxl_turbo_dpo.py:33``; DreamBooth forces
``initial_global_step = 0``). Here save/restore round-trips the full
train state (step, LoRA params, optimizer state) plus a metadata dict,
and ``latest_checkpoint`` resolves a run directory to its newest step.
"""

from __future__ import annotations

import os
import re
from typing import Optional

import orbax.checkpoint as ocp


def _ckpt_dir(base: str, step: int) -> str:
    return os.path.join(os.path.abspath(base), f"checkpoint-{step}")


def save_train_state(base_dir: str, step: int, state, extra: Optional[dict] = None):
    """Write ``<base>/checkpoint-<step>`` atomically via orbax."""
    path = _ckpt_dir(base_dir, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"state": state, "extra": extra or {}}, force=True)
    return path


def restore_train_state(path: str, abstract_state, abstract_extra: Optional[dict] = None):
    """Restore into the structure of ``abstract_state`` (a live or
    jax.eval_shape'd pytree)."""
    with ocp.StandardCheckpointer() as ckptr:
        out = ckptr.restore(
            os.path.abspath(path),
            {"state": abstract_state, "extra": abstract_extra or {}},
        )
    return out["state"], out["extra"]


def prune_checkpoints(base_dir: str, keep: int) -> list[str]:
    """Delete all but the newest ``keep`` checkpoint-### dirs (the
    reference's ``num_checkpoint_limit``). Returns removed paths."""
    import shutil

    if keep <= 0 or not os.path.isdir(base_dir):
        return []
    steps = []
    for name in os.listdir(base_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    removed = []
    for step in sorted(steps)[:-keep]:
        path = _ckpt_dir(base_dir, step)
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


def latest_checkpoint(base_dir: str) -> Optional[str]:
    """Newest ``checkpoint-<n>`` under ``base_dir`` (or the dir itself)."""
    if re.search(r"checkpoint-\d+$", base_dir.rstrip("/")):
        return base_dir
    if not os.path.isdir(base_dir):
        return None
    steps = []
    for name in os.listdir(base_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    if not steps:
        return None
    return _ckpt_dir(base_dir, max(steps))

"""Metrics/observability: console + JSONL + optional wandb.

The reference logs scalars and image grids through Accelerate's wandb
tracker (``train_online_pso_sdxl_turbo.py:497-502,682-687``) — including
a hardcoded API key committed to the repo, which we emphatically do not
reproduce. Here wandb is optional (and only if importable); the durable
record is an append-only JSONL metrics file per run, which is grep/pandas
friendly and works on network-isolated TPU workers.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


def get_logger(name: str = "pso") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class MetricLogger:
    def __init__(
        self,
        output_dir: Optional[str] = None,
        run_name: str = "run",
        use_wandb: bool = False,
        wandb_project: str = "Online_PSO",
        config: Optional[dict] = None,
    ):
        self.log = get_logger()
        self._jsonl = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, name=run_name, config=config or {}
                )
            except Exception as e:  # wandb absent or offline — JSONL still records
                self.log.warning("wandb unavailable (%s); JSONL logging only", e)

    def log_metrics(self, metrics: Dict[str, Any], step: int):
        clean = {
            k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()
        }
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, "ts": time.time(), **clean}) + "\n")
            self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(clean, step=step)
        self.log.info("step %d: %s", step, {k: round(v, 5) if isinstance(v, float) else v for k, v in clean.items()})

    def log_images(self, key: str, images, step: int, captions=None):
        """Image-grid logging (reference wandb grids,
        ``train_online_pso_sdxl_turbo.py:170-193``). ``images``: array-like
        (N, H, W, 3) in [-1, 1]. No-op beyond a JSONL record when wandb is
        off — PNG persistence is the callers' job (they already save)."""
        import numpy as np

        arr = np.asarray(images)
        if self._jsonl:
            self._jsonl.write(
                json.dumps(
                    {"step": step, "ts": time.time(), f"{key}/n_images": int(arr.shape[0])}
                )
                + "\n"
            )
            self._jsonl.flush()
        if self._wandb is not None:
            import wandb

            u8 = ((arr.clip(-1.0, 1.0) + 1.0) * 127.5).astype("uint8")
            imgs = [
                wandb.Image(
                    u8[i],
                    caption=(captions[i] if captions and i < len(captions) else None),
                )
                for i in range(u8.shape[0])
            ]
            self._wandb.log({key: imgs}, step=step)

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb is not None:
            self._wandb.finish()

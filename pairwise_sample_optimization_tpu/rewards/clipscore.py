"""CLIP score (validation metric): laion2B CLIP-H cosine similarity.

Rebuild of reference ``pso_pytorch/clip_utils.py`` — same compute as
PickScore (diag of normalized text @ image^T) with the original laion2B
ViT-H-14 weights instead of the PickScore fine-tune, and open_clip's
resize-longest eval transform (equivalent to plain resize for the square
images this pipeline produces).
"""

from __future__ import annotations

from .pickscore import PickScoreScorer


class CLIPScorer(PickScoreScorer):
    """Same architecture/score; distinguished only by its weight set."""

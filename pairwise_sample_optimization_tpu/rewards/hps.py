"""HPSv2 scorer: CLIP-H architecture with the HPS_v2 preference checkpoint.

The reference's ``pso_pytorch/hps_utils.py`` is broken in-tree (dead
import of a nonexistent ``tokenizer_hps`` module and a hardcoded
``root_path``) and unused by the trainers; the working semantics are the
same dual-encoder cosine score as CLIP score with the HPS_v2 weights.
``HPS_v2_compressed.pt`` is an **open_clip-format** state dict wrapped
under a ``state_dict`` key (reference ``hps_utils.py:64-71``);
``checkpoints.load_hf_clip_dual`` auto-detects that format, splits the
fused qkv and transposes the raw projection matrices (parity-tested in
``tests/test_scorer_weight_port.py``). No auto-download — this framework
does no network I/O at runtime; pass a local path (eval ``--hps_path``).
"""

from __future__ import annotations

from .pickscore import PickScoreScorer


class HPSScorer(PickScoreScorer):
    """CLIP-H cosine scorer under the HPSv2 weight set."""

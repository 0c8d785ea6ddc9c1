"""Real-weight gated end-to-end protocol test.

Skips cleanly unless local checkpoints are mounted via env vars (this
environment has zero network egress — weights cannot be downloaded). The
moment they are present, the port-fidelity claim becomes falsifiable:
the 4-step DMD2-style eval protocol runs end to end from local files and
the scores must land in sane real-model bands.

Env vars (see README):
  PSO_SDXL_DIR           local diffusers-layout SDXL dir (required)
  PSO_PICKSCORE_DIR      HF CLIPModel dir/file (PickScore_v1) (required)
  PSO_BPE_PATH           CLIP BPE vocab (bpe_simple_vocab_16e6.txt[.gz])
  PSO_CLIP_DIR           HF CLIPModel dir/file (laion CLIP-H)  (optional)
  PSO_HPS_PATH           HPS_v2_compressed.pt                  (optional)
  PSO_AESTHETIC_MLP_PATH sac+logos+ava1-l14-linearMSE.pth      (optional)
  PSO_AESTHETIC_CLIP_DIR HF CLIPModel dir (clip-vit-large-patch14)
  PSO_IMAGEREWARD_PATH   ImageReward-v1.0 .pt                  (optional)
  PSO_WORDPIECE_VOCAB    bert-base vocab.txt (for ImageReward)
"""

import os

import numpy as np
import pytest

SDXL_DIR = os.environ.get("PSO_SDXL_DIR", "")
PICKSCORE_DIR = os.environ.get("PSO_PICKSCORE_DIR", "")

pytestmark = pytest.mark.skipif(
    not (SDXL_DIR and os.path.isdir(SDXL_DIR) and PICKSCORE_DIR
         and os.path.exists(PICKSCORE_DIR)),
    reason="real weights not mounted (set PSO_SDXL_DIR + PSO_PICKSCORE_DIR)",
)


def test_eval_protocol_with_real_weights(tmp_path):
    """4 prompts through the real 4-step protocol; scores must be finite,
    non-degenerate, and inside real-model bands."""
    import json

    from pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 import main

    scorers = ["pickscore"]
    argv = [
        f"--model_dir={SDXL_DIR}",
        f"--pickscore_dir={PICKSCORE_DIR}",
        "--max_prompts=4",
        "--batch_size=2",
        "--num_steps=4",
        "--resolution=1024",
        f"--output_json={tmp_path / 'real_eval.json'}",
    ]
    bpe = os.environ.get("PSO_BPE_PATH", "")
    if bpe:
        argv.append(f"--bpe_path={bpe}")
    if os.environ.get("PSO_CLIP_DIR"):
        scorers.append("clip")
        argv.append(f"--clip_dir={os.environ['PSO_CLIP_DIR']}")
    if os.environ.get("PSO_HPS_PATH"):
        scorers.append("hps")
        argv.append(f"--hps_path={os.environ['PSO_HPS_PATH']}")
    if os.environ.get("PSO_AESTHETIC_MLP_PATH") and os.environ.get(
        "PSO_AESTHETIC_CLIP_DIR"
    ):
        scorers.append("aesthetic")
        argv.append(f"--aesthetic_mlp_path={os.environ['PSO_AESTHETIC_MLP_PATH']}")
        argv.append(f"--aesthetic_clip_dir={os.environ['PSO_AESTHETIC_CLIP_DIR']}")
    if os.environ.get("PSO_IMAGEREWARD_PATH") and os.environ.get(
        "PSO_WORDPIECE_VOCAB"
    ):
        scorers.append("imagereward")
        argv.append(f"--imagereward_path={os.environ['PSO_IMAGEREWARD_PATH']}")
        argv.append(f"--wordpiece_vocab={os.environ['PSO_WORDPIECE_VOCAB']}")
    argv.append("--scorers=" + ",".join(scorers))

    summary = main(argv)
    assert all(np.isfinite(v) for v in summary.values()), summary
    # real CLIP-family cosines on on-prompt generations are positive and
    # bounded by 1; a random tower sits near 0 with tiny spread
    assert 0.05 < summary["pickscore_mean"] < 1.0, summary
    if "clip_mean" in summary:
        assert 0.05 < summary["clip_mean"] < 1.0, summary
    if "hps_mean" in summary:
        assert 0.05 < summary["hps_mean"] < 1.0, summary
    if "aesthetic_mean" in summary:
        # LAION aesthetic scale is ~[1, 10] on real images
        assert 1.0 < summary["aesthetic_mean"] < 10.0, summary
    if "imagereward_mean" in summary:
        # standardized reward; |z| beyond 5 means a broken port
        assert abs(summary["imagereward_mean"]) < 5.0, summary
    with open(tmp_path / "real_eval.json") as f:
        report = json.load(f)
    assert report["n_prompts"] == 4
    # per-prompt spread: a constant vector means degenerate scoring
    pp = np.asarray(report["per_prompt"]["pickscore"])
    assert pp.std() > 1e-5, pp

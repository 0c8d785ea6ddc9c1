"""Worker for the 2-process eval-identity test (tests/test_multihost.py).

Runs the real evaluate_sdxl_dmd2 CLI (tiny models) under a 2-process
jax.distributed loopback; rank 0 writes the per-prompt JSON. The parent
test compares it against a single-process run of the same CLI — the
per-prompt scores must be IDENTICAL (generation noise is keyed by
global prompt index, not by rank)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge

xla_bridge._clear_backends()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("PSO_NUM_PROCESSES", "1") != "1":
    from pairwise_sample_optimization_tpu.parallel.multihost import (
        maybe_initialize_distributed,
    )

    assert maybe_initialize_distributed(), "distributed bring-up failed"
    assert jax.process_count() == 2, jax.process_count()

    # establish the gloo context NOW, while both ranks are still aligned
    # at startup — the eval's own gathers come after minutes of
    # single-core compile skew, past gloo's 30s context-init window
    import numpy as np

    from pairwise_sample_optimization_tpu.parallel.collectives import (
        process_allgather,
    )

    process_allgather(np.zeros(1, np.float32))

from pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 import main

main(
    [
        "--tiny",
        f"--prompts_json={os.environ['PSO_EVAL_PROMPTS']}",
        "--resolution=16",
        "--batch_size=2",
        "--scorers=pickscore,aesthetic",
        f"--output_json={os.environ['PSO_EVAL_OUT']}",
    ]
)
print(f"EVAL_WORKER_OK rank={jax.process_index()}")

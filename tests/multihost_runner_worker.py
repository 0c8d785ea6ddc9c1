"""Worker: 2-process jax.distributed run of the REAL online runner.

Exercises the multi-host leg of the mesh wiring — per-host prompt
batches assembled into global arrays via host_local_array_to_global_array,
global microbatch slicing (per-host train bs x process_count), jitted
identity resharding, and the replicated reward fetch — none of which the
single-process virtual-device tests can reach.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge

xla_bridge._clear_backends()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from jax.sharding import PartitionSpec as P


def main():
    from pairwise_sample_optimization_tpu.cli.online_runner import run_online_pso
    from pairwise_sample_optimization_tpu.configs import turbo_config

    config = turbo_config()
    config.tiny_model = True
    config.mixed_precision = "no"
    config.sample.resolution = 16
    config.sample.batch_size = 1  # per host -> global batch 2 over 2 devices
    config.sample.num_batches_per_epoch = 1
    config.train.batch_size = 1  # per host -> global update batch 2
    config.train.gradient_accumulation_steps = 1
    config.train.lora_rank = 2
    # exercise the COLLECTIVE orbax save (every process must enter it;
    # a rank-0-only save hangs at orbax's cross-process barrier)
    config.checkpointing_steps = 2
    config.validation_steps = 0
    config.val_max_prompts = 2
    config.output_dir = os.environ["PSO_TEST_OUT"]
    config.run_name = f"mh_rank{os.environ['PSO_PROCESS_ID']}"

    dbg = {}
    # 2 epochs: epoch-2 losses leave the on-policy log(2) anchor, so they
    # are only host-identical if every SPMD program (incl. train_epoch's
    # shuffle) ran with process-invariant keys over consistent global data
    _state, history = run_online_pso(
        config, sampler="turbo", num_epochs=2, debug_out=dbg
    )
    assert jax.process_count() == 2, jax.process_count()
    np.testing.assert_allclose(history[0]["loss"], np.log(2.0), rtol=1e-3)
    # per-host (1, 77) id batches became ONE global (2, 77) array sharded
    # over the 2-process data axis
    assert dbg["ids_sharding"].spec == P("data"), dbg["ids_sharding"]
    losses = ",".join(f"{h['loss']:.9f}" for h in history)
    print(f"WORKER_OK rank={jax.process_index()} losses={losses}")


main()

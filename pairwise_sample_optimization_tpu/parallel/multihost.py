"""Multi-host bring-up: jax.distributed over DCN.

The reference scales by ``accelerate launch`` spawning one NCCL process
per GPU; the TPU equivalent is one process per host with
``jax.distributed.initialize`` (chips-per-host handled by the runtime,
cross-host collectives ride DCN). On single-host (or under the CPU test
platform) this is a no-op.

Env contract (standard JAX cluster envs are auto-detected on Cloud TPU;
the explicit ones below cover bare-metal/manual launches):
  PSO_COORDINATOR  host:port of process 0
  PSO_NUM_PROCESSES / PSO_PROCESS_ID
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Idempotently initialize jax.distributed when configured. Returns
    True if a multi-process runtime is (now) active.

    Ordering matters: ``jax.distributed.initialize`` must run BEFORE the
    first backend query (``jax.devices()``/``process_count()`` freeze the
    runtime) — so the env check comes first and the backend is only
    touched afterwards.
    """
    global _initialized
    if not _initialized:
        coord = os.environ.get("PSO_COORDINATOR")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["PSO_NUM_PROCESSES"]),
                process_id=int(os.environ["PSO_PROCESS_ID"]),
            )
        elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
            # standard JAX cluster envs (auto-detected on Cloud TPU pods)
            jax.distributed.initialize()
        _initialized = True
    multi = jax.process_count() > 1
    if multi:
        # establish the host-collective (Gloo/DCN) context NOW, while all
        # processes are still in lockstep at startup — the first host
        # collective otherwise happens deep inside the run, after
        # per-process compile phases that can drift ranks apart by more
        # than the 30 s rendezvous window
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("pso:multihost:startup")
    return multi

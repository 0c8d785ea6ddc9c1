"""Sweep the Pallas flash-attention BACKWARD at the DMD2 shape, with
RTT-AMORTIZED timing.

The 1024^2 update phase's ceiling-setter is the mandatory flash backward
at seq 4096 (16 GB forbids XLA's materialized logits there). Sweeps bwd
tile caps (independent of the forward's). Sub-50 ms kernels must be
timed as a lax.scan loop of N calls inside ONE jit — the axon tunnel
adds a session-dependent ~0-27 ms per dispatch+readback (CLAUDE.md
measurement gotcha (d)); the original per-call version of this script
produced RTT-dominated numbers.

Usage: python scripts/bench_flash_bwd.py [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

from pairwise_sample_optimization_tpu.ops import flash_attention as fa
from pairwise_sample_optimization_tpu.utils.cache import enable_compilation_cache

N_INNER = 10  # fwd+bwd calls amortizing one dispatch+readback


def bench_one(bq_cap, bk_cap, q, k, v, reps):
    default_caps = fa._BWD_CAPS
    fa.set_bwd_block_caps(bq_cap, bk_cap)
    try:
        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def loop(q, k, v):
            def body(qq, _):
                dq, _dk, _dv = g(qq, k, v)
                # fold dq back in so the scan carries a data dependence
                # (defeats dead-code elimination across iterations)
                return qq + 1e-6 * dq.astype(qq.dtype), ()

            out, _ = lax.scan(body, q, None, length=N_INNER)
            return out

        out = loop(q, k, v)  # compile + warmup
        np.asarray(out[0, 0])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = loop(q, k, v)
            np.asarray(out[0, 0])
            times.append(time.perf_counter() - t0)
        return min(times) / N_INNER
    finally:
        fa.set_bwd_block_caps(*default_caps)


def main():
    enable_compilation_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = jax.random.key(0)
    shapes = [
        (2, 4096, 10, 64),   # micro-bs 1 fused traj pair
        (4, 4096, 10, 64),
    ]
    for (b, s, h, d) in shapes:
        q = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        print(f"== shape b{b} s{s} h{h} d{d} (fwd+bwd per call, x{N_INNER} "
              "amortized) ==", flush=True)
        for (bq, bk) in [
            (1024, 512), (2048, 512), (1024, 1024), (512, 512),
            (2048, 256), (512, 1024), (4096, 512), (2048, 1024),
        ]:
            try:
                t = bench_one(bq, bk, q, k, v, reps)
                print(f"  bwd caps ({bq:5d},{bk:5d}): {t * 1e3:8.2f} ms",
                      flush=True)
            except Exception as e:  # VMEM overflow etc.
                print(f"  bwd caps ({bq:5d},{bk:5d}): FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()

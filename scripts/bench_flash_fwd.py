"""Sweep the Pallas flash-attention FORWARD tile caps at the 1024^2
mandatory-route shapes.

The forward caps (1024/512) were tuned at seq 4096 h10 d64 b8; the DMD2
sampling phase runs the same attention at b2-b4 occupancy, and the VAE
decoder's mid-block attention runs seq 16384 with ONE d512 head — both
take the Pallas route because XLA cannot materialize their logits on a
16 GB chip. Hard-sync timing (np.asarray readback).

Usage: python scripts/bench_flash_fwd.py [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from pairwise_sample_optimization_tpu.ops import flash_attention as fa
from pairwise_sample_optimization_tpu.utils.cache import enable_compilation_cache


def bench_one(bq_cap, bk_cap, q, k, v, reps):
    fa.set_fwd_block_caps(bq_cap, bk_cap)
    f = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v))
    out = f(q, k, v)  # compile + warmup
    np.asarray(out[0, 0])
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(q, k, v)
        np.asarray(out[0, 0])
        times.append(time.perf_counter() - t0)
    fa.set_fwd_block_caps(1024, 512)
    return min(times)


def main():
    enable_compilation_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = jax.random.key(0)
    shapes = [
        (2, 4096, 10, 64),    # UNet level-1 self-attn, DMD2 update micro
        (4, 4096, 10, 64),    # sampling batch
        (8, 4096, 10, 64),    # the tuned reference point
        (4, 16384, 1, 512),   # VAE decoder mid-block @1024^2 (1 head d512)
    ]
    for (b, s, h, d) in shapes:
        q = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        print(f"== shape b{b} s{s} h{h} d{d} ==", flush=True)
        for (bq, bk) in [
            (1024, 512), (2048, 512), (512, 512), (1024, 1024),
            (2048, 1024), (4096, 512), (512, 256), (256, 512),
        ]:
            try:
                t = bench_one(bq, bk, q, k, v, reps)
                print(f"  fwd caps ({bq:5d},{bk:5d}): {t * 1e3:8.2f} ms",
                      flush=True)
            except Exception as e:  # VMEM overflow etc.
                print(f"  fwd caps ({bq:5d},{bk:5d}): FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()

"""Sweep the Pallas flash-attention FORWARD tile caps at the 1024^2
mandatory-route shapes, with RTT-AMORTIZED timing.

The axon tunnel adds a session-dependent fixed ~0-27 ms per
dispatch+readback (CLAUDE.md measurement gotcha (d)), so sub-50 ms
kernels must be timed as a lax.scan loop of N calls inside ONE jit —
per-call timings are garbage across sessions. Each row reports the
EFFECTIVE (bq, bk) actually chosen by ``_block_sizes`` (the d>128 gate
clamps bk to 512 for wide heads, so some requested caps coincide).

Shapes: the UNet s4096 self-attention (the only Pallas-mandatory UNet
shape at 1024^2) and the VAE decoder mid-block (s16384, ONE d512 head).

Usage: python scripts/bench_flash_fwd.py [reps]
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

N_INNER = 20  # kernel calls amortizing one dispatch+readback


def bench_one(bq_cap, bk_cap, q, k, v, reps):
    default_caps = fa._FWD_CAPS
    fa.set_fwd_block_caps(bq_cap, bk_cap)
    try:
        effective = fa._block_sizes(q.shape[1], k.shape[1], q.shape[3])

        @jax.jit
        def loop(q, k, v):
            def body(qq, _):
                return fa.flash_attention(qq, k, v), ()

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
        return min(times) / N_INNER, effective
    finally:
        fa.set_fwd_block_caps(*default_caps)


def main():
    enable_compilation_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = jax.random.key(0)
    shapes = [
        (2, 4096, 10, 64),    # UNet level-1 self-attn, DMD2 update micro
        (8, 4096, 10, 64),    # larger-batch reference point
        (4, 16384, 1, 512),   # VAE decoder mid-block @1024^2 (1 head d512)
    ]
    for (b, s, h, d) in shapes:
        q = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(rng, (b, s, h, d), jnp.bfloat16)
        print(f"== shape b{b} s{s} h{h} d{d} (per-call, x{N_INNER} amortized) ==",
              flush=True)
        seen = set()
        for (bq, bk) in [
            (1024, 512), (1024, 1024), (2048, 512), (512, 512),
            (2048, 1024), (512, 1024),
        ]:
            try:
                t, eff = bench_one(bq, bk, q, k, v, reps)
                dup = " (= effective dup)" if eff in seen else ""
                seen.add(eff)
                print(f"  caps ({bq:4d},{bk:4d}) -> effective {eff}: "
                      f"{t * 1e3:7.2f} ms{dup}", flush=True)
            except Exception as e:  # VMEM overflow etc.
                print(f"  caps ({bq:4d},{bk:4d}): FAIL {type(e).__name__}",
                      flush=True)


if __name__ == "__main__":
    main()

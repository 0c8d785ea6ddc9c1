"""VAE-decoder microbenches on the real chip.

Probes the two round-2 decoder levers before committing to them:
1. subpixel upsample+conv (2x2 kernels on the coarse grid, 2.25x fewer
   FLOPs than nearest-2x + 3x3 conv) vs the naive broadcast+conv;
2. int8 convolution lowering (does XLA hit the v5e int8 MXU rate?);
3. bf16 conv utilization at the decoder's per-level shapes.

Usage: python -u scripts/microbench_vae.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

DN = ("NHWC", "HWIO", "NHWC")


def sync(x):
    np.asarray(x)  # value readback: the only reliable sync through axon


def timeit(f, *args, iters=20):
    r = f(*args)
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    sync(r)
    return (time.perf_counter() - t0) / iters


def conv3(x, k):
    return lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN)


def upsample_naive(x, k):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    x = x.reshape(b, 2 * h, 2 * w, c)
    return conv3(x, k)


def subpixel_kernel(k):
    """(3,3,C,O) -> (2,2,C,4,O): combined 2x2 kernels for the 4 output parities.

    nearest-2x upsample + 3x3 conv == per-parity 2x2 conv on the coarse grid:
    output row 2i+a reads coarse rows [i-1,i] (a=0, taps [K0, K1+K2]) or
    [i,i+1] (a=1, taps [K0+K1, K2]); same along columns.
    """
    kf = k.astype(jnp.float32)
    rows = {
        0: jnp.stack([kf[0], kf[1] + kf[2]], 0),  # (2,3,C,O) taps over [i-1, i]
        1: jnp.stack([kf[0] + kf[1], kf[2]], 0),  # taps over [i, i+1]
    }

    def cols(r2, b):
        # r2: (2,3,C,O) -> (2,2,C,O)
        if b == 0:
            return jnp.stack([r2[:, 0], r2[:, 1] + r2[:, 2]], 1)
        return jnp.stack([r2[:, 0] + r2[:, 1], r2[:, 2]], 1)

    parts = [cols(rows[a], b) for a in (0, 1) for b in (0, 1)]  # parity order (a,b)
    return jnp.stack(parts, axis=3).astype(k.dtype)  # (2,2,C,4,O)


def upsample_subpixel(x, k):
    b, h, w, c = x.shape
    o = k.shape[-1]
    k4 = subpixel_kernel(k).reshape(2, 2, c, 4 * o)
    y = lax.conv_general_dilated(
        x, k4, (1, 1), ((1, 1), (1, 1)), dimension_numbers=DN
    )  # (b, h+1, w+1, 4o)
    y = y.reshape(b, h + 1, w + 1, 2, 2, o)
    # parity (a,bp) output pixel (2i+a, 2j+bp) = y[i+a, j+bp, a, bp]
    p00 = y[:, :h, :w, 0, 0]
    p01 = y[:, :h, 1:, 0, 1]
    p10 = y[:, 1:, :w, 1, 0]
    p11 = y[:, 1:, 1:, 1, 1]
    top = jnp.stack([p00, p01], 3)  # (b,h,w,2,o) cols interleave for a=0
    bot = jnp.stack([p10, p11], 3)
    out = jnp.stack([top, bot], 2)  # (b,h,2,w,2,o)
    return out.reshape(b, 2 * h, 2 * w, o)


def main():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pairwise_sample_optimization_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())
    key = jax.random.key(0)

    # --- 1. subpixel correctness (fp32) ---
    x = jax.random.normal(key, (2, 16, 16, 8), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (3, 3, 8, 8), jnp.float32) * 0.1
    a = np.asarray(upsample_naive(x, k))
    b = np.asarray(upsample_subpixel(x, k))
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    print(f"subpixel rel err (fp32): {err:.2e}")

    # --- 2. timing at decoder shapes (bf16, batch 8) ---
    shapes = [
        ("up64->128 c512", (8, 64, 64, 512), 512),
        ("up128->256 c512", (8, 128, 128, 512), 512),
        ("up256->512 c256", (8, 256, 256, 256), 256),
    ]
    for name, xs, o in shapes:
        x = jax.random.normal(key, xs, jnp.bfloat16)
        k = (jax.random.normal(key, (3, 3, xs[-1], o)) * 0.05).astype(jnp.bfloat16)
        f_n = jax.jit(lambda x, k: jnp.sum(upsample_naive(x, k).astype(jnp.float32)))
        f_s = jax.jit(lambda x, k: jnp.sum(upsample_subpixel(x, k).astype(jnp.float32)))
        tn = timeit(f_n, x, k)
        ts = timeit(f_s, x, k)
        gf = xs[0] * xs[1] * xs[2] * 4 * xs[3] * o * 9 * 2 / 1e9
        print(
            f"{name}: naive {tn*1e3:.2f} ms ({gf/tn/1e3:.1f} TF/s) | "
            f"subpixel {ts*1e3:.2f} ms (equiv {gf/ts/1e3:.1f} TF/s)"
        )

    # --- 3. plain conv utilization at resnet shapes ---
    for name, xs, o in [
        ("res128@512^2", (8, 512, 512, 128), 128),
        ("res256@256^2", (8, 256, 256, 256), 256),
        ("res512@128^2", (8, 128, 128, 512), 512),
        ("res512@64^2", (8, 64, 64, 512), 512),
    ]:
        x = jax.random.normal(key, xs, jnp.bfloat16)
        k = (jax.random.normal(key, (3, 3, xs[-1], o)) * 0.05).astype(jnp.bfloat16)
        f = jax.jit(lambda x, k: jnp.sum(conv3(x, k).astype(jnp.float32)))
        t = timeit(f, x, k)
        gf = xs[0] * xs[1] * xs[2] * xs[3] * o * 9 * 2 / 1e9
        print(f"conv3x3 {name}: {t*1e3:.2f} ms  {gf/t/1e3:.1f} TF/s bf16")

        # int8 probe on the same shape
        xi = (x.astype(jnp.float32) * 10).astype(jnp.int8)
        ki = (k.astype(jnp.float32) * 100).astype(jnp.int8)
        try:
            fi = jax.jit(
                lambda x, k: jnp.sum(
                    lax.conv_general_dilated(
                        x, k, (1, 1), ((1, 1), (1, 1)),
                        dimension_numbers=DN,
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                )
            )
            ti = timeit(fi, xi, ki)
            print(f"  int8: {ti*1e3:.2f} ms  {gf/ti/1e3:.1f} TOP/s")
        except Exception as e:
            print(f"  int8 conv failed: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()

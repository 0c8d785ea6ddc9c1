"""Decompose the DMD2 @1024^2 update phase: where do 8.2s live?

Times, hard-synced, at the update's exact shapes (micro-bs 1 pair = b2,
remat full, LoRA r32, bf16):
  1. UNet fwd b2 (the unfused ref pass unit)
  2. UNet fwd b4 (batch-efficiency probe)
  3. grad(policy DPO-style scalar) b2 with remat full (fwd+bwd unit)
Update epoch = ga4 scan of [ref fwd b2 (x2: win/lose recompute? no - pair
fused in b2) + policy fwd+bwd b2]; compare sum of parts vs measured 8.2s.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline
from pairwise_sample_optimization_tpu.models.sdxl_text import compute_time_ids
from pairwise_sample_optimization_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

RES = 1024
pipe = SDXLPipeline.random(lora_rank=32, dtype=jnp.bfloat16, resolution=RES,
                           fast_init=True, param_dtype=jnp.bfloat16, remat="full")
hw = RES // 8

def cond_of(b):
    return {"embeds": jnp.ones((b, 77, 2048), jnp.bfloat16),
            "pooled": jnp.ones((b, 1280), jnp.bfloat16),
            "time_ids": compute_time_ids(b, RES)}

variables = pipe.unet_variables
t = jnp.full((1,), 499, jnp.int32)

def timeit(f, *args, reps=4):
    out = f(*args); np.asarray(jax.tree.leaves(out)[0][(0,)*jax.tree.leaves(out)[0].ndim])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(*args)
        np.asarray(jax.tree.leaves(out)[0][(0,)*jax.tree.leaves(out)[0].ndim])
        ts.append(time.perf_counter() - t0)
    return min(ts)

for b in (2, 4):
    x = jnp.zeros((b, hw, hw, 4), jnp.bfloat16)
    f = jax.jit(lambda v, x: pipe.unet_apply(v, x, jnp.broadcast_to(t, (x.shape[0],)), cond_of(x.shape[0]), 1.0))
    dt = timeit(f, variables, x)
    print(f"UNet fwd b{b} @1024^2: {dt*1e3:8.1f} ms  ({dt/b*1e3:.1f} ms/img)", flush=True)

# fwd+bwd: grad wrt lora of a scalar through the policy pass, b2
x2 = jnp.zeros((2, hw, hw, 4), jnp.bfloat16)
def loss(lora, params, x):
    v = {"params": params, "lora": lora}
    eps = pipe.unet_apply(v, x, jnp.broadcast_to(t, (2,)), cond_of(2), 1.0)
    return jnp.mean(eps.astype(jnp.float32) ** 2)
g = jax.jit(jax.grad(loss))
dt = timeit(g, variables["lora"], variables["params"], x2)
print(f"UNet fwd+bwd(remat full) b2 @1024^2: {dt*1e3:8.1f} ms", flush=True)
print("DECOMP_OK", flush=True)

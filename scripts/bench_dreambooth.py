"""DreamBooth-PSO throughput bench on the real chip (hard-sync timing).

Measures the third reference workload (VERDICT r4 #3) at the exact
reference shape of ``/root/reference/personalization/scripts/pso_dog.sh:15-41``:
512^2, train bs 1, grad-accum 4, LoRA r16, EDM-style (euler_edm space),
``pso_db`` beta=5, prior weight 0.5, 20-negative pool, fp16-class (bf16)
storage, no gradient checkpointing (the reference script does not pass
``--gradient_checkpointing``).

The steady-state step of the shipped CLI
(cli/train_pso_sdxl_turbo_dreambooth.py) is: draw win/lose latents from
the pre-encoded pools (``draw_latents``) + one jitted
``DreamBoothPSOTrainer.update`` over ga microbatches. Pool encoding and
the 20-negative self-generation happen once per run (negative regen is
hardcoded to step 0 in the reference, ``:1702-1703``) — measured
separately here, not amortized into steps/s.

FLOP floor: the ga=1 update program's XLA cost analysis x ga (the
lax.scan body is counted once by cost_analysis; multiplying the ga=1
program sidesteps the correction), over the v5e's 197 TF/s bf16 peak.

Knobs: PSO_DB_REMAT=none|full (default none, the reference default)
       PSO_DB_STEPS=N timed steps (default 20)
       PSO_DB_ONETIME=1 also measure pool encode + negative generation

Usage: python -u scripts/bench_dreambooth.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

TINY = os.environ.get("PSO_DB_TINY", "0") == "1"  # CPU logic smoke
RES = 16 if TINY else 512
BS = 1
GA = 4
RANK = 2 if TINY else 16
REMAT = os.environ.get("PSO_DB_REMAT", "none")
N_STEPS = int(os.environ.get("PSO_DB_STEPS", "20"))
ONETIME = os.environ.get("PSO_DB_ONETIME", "0") == "1"
PEAK_TF = 197.0  # v5e bf16


def main():
    from pairwise_sample_optimization_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline
    from pairwise_sample_optimization_tpu.train import (
        DreamBoothPSOConfig,
        DreamBoothPSOTrainer,
        PSOTrainState,
        make_optimizer,
    )

    remat = False if REMAT in ("none", "") else REMAT
    pipe = SDXLPipeline.random(
        lora_rank=RANK,
        dtype=jnp.bfloat16,
        resolution=RES,
        fast_init=not TINY,
        tiny=TINY,
        param_dtype=None if TINY else jnp.bfloat16,
        remat=remat,
    )
    hw = pipe.latent_hw
    ctx_dim = pipe.unet_config.cross_attention_dim
    pooled_dim = pipe.unet_config.pooled_embed_dim

    def make_trainer(ga):
        cfg = DreamBoothPSOConfig(grad_accum=ga)  # defaults == pso_dog.sh
        tx = make_optimizer(learning_rate=2e-4)
        return DreamBoothPSOTrainer(cfg, pipe.unet_apply, tx), tx

    trainer, tx = make_trainer(GA)
    # fresh copies: update() DONATES the state, and aliasing the pipe's
    # live lora tree would delete the buffers the ONETIME negative
    # generation reads afterwards
    lora0 = jax.tree.map(jnp.array, pipe.unet_variables["lora"])
    state = PSOTrainState.create(lora0, tx)
    params = pipe.unet_variables["params"]

    def make_batch(ga, key):
        def lead(shape):
            return (ga,) + shape if ga > 1 else shape

        ks = jax.random.split(key, 4)
        cond = {
            "embeds": jax.random.normal(ks[0], lead((BS, 77, ctx_dim)), jnp.bfloat16),
            "pooled": jax.random.normal(ks[1], lead((BS, pooled_dim)), jnp.bfloat16),
            "time_ids": jnp.tile(
                jnp.asarray([[RES, RES, 0, 0, RES, RES]], jnp.float32),
                lead((BS, 1))[:-1] + (1,),
            ).reshape(lead((BS, 6))),
        }
        return {
            "instance_latents": jax.random.normal(ks[2], lead((BS, hw, hw, 4)), jnp.float32),
            "negative_latents": jax.random.normal(ks[3], lead((BS, hw, hw, 4)), jnp.float32),
            "cond": cond,
        }

    batch = make_batch(GA, jax.random.key(0))

    # ---- FLOP floor from the ga=1 program ----
    step_tf = floor_s = None
    try:
        trainer1, tx1 = make_trainer(1)
        state1 = PSOTrainState.create(jax.tree.map(jnp.array, lora0), tx1)
        batch1 = make_batch(1, jax.random.key(1))
        lowered1 = trainer1._update.lower(state1, params, batch1, jax.random.key(2))
        cost = lowered1.compile().cost_analysis()
        flops_1 = float(cost.get("flops", 0.0)) if cost else 0.0
        if flops_1 > 0:
            step_tf = GA * flops_1 / 1e12
            floor_s = step_tf / PEAK_TF
        del trainer1, state1, batch1, lowered1
    except Exception as e:  # cost analysis is best-effort context
        print(f"# FLOP floor unavailable: {type(e).__name__}: {e}", file=sys.stderr)

    # ---- compile + warm the real ga=4 update ----
    t0 = time.perf_counter()
    key = jax.random.key(3)
    state, aux = trainer.update(state, params, batch, key)
    loss0 = float(np.asarray(aux["loss"]))  # readback = reliable sync
    compile_s = time.perf_counter() - t0
    print(f"# update compile+first-step: {compile_s:.1f}s loss={loss0:.4f}",
          file=sys.stderr)

    # ---- timed steady-state steps ----
    t0 = time.perf_counter()
    for i in range(N_STEPS):
        state, aux = trainer.update(state, params, batch, jax.random.key(10 + i))
    np.asarray(aux["loss"])
    dt = (time.perf_counter() - t0) / N_STEPS
    steps_per_s = 1.0 / dt

    record = {
        "metric": "dreambooth_pso_steps_per_sec",
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "step_ms": round(dt * 1e3, 1),
        "shape": f"{RES}^2 bs{BS} ga{GA} r{RANK} pso_db euler_edm remat={REMAT}",
        "flops_per_step_tf": round(step_tf, 2) if step_tf else None,
        "roofline_floor_ms": round(floor_s * 1e3, 1) if floor_s else None,
        "roofline_fraction": round(floor_s / dt, 3) if floor_s and dt > 0 else None,
    }

    if ONETIME:
        # pool encode: instance images + 20 negatives through the VAE
        # encoder (once per run in the shipped CLI)
        imgs = jax.random.uniform(jax.random.key(20), (21, RES, RES, 3), jnp.float32)
        enc = jax.jit(
            lambda v, x: pipe.vae.apply(v, x, method=pipe.vae.encode)
        )
        out = enc(pipe.vae_variables, imgs)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        out = enc(pipe.vae_variables, imgs)
        np.asarray(jax.tree.leaves(out)[0])
        record["onetime_pool_encode_s"] = round(time.perf_counter() - t0, 2)

        # negative generation: 20 images, 4-step turbo, class prompt
        ids = jnp.ones((4, 77), jnp.int32)
        cond = pipe.encode_prompt(ids, ids)

        def gen(k):
            return pipe.generate(cond, k, num_steps=4)

        g = jax.jit(gen)
        np.asarray(g(jax.random.key(30)))
        t0 = time.perf_counter()
        for i in range(5):  # 20 negatives in batches of 4
            img = g(jax.random.key(31 + i))
        np.asarray(img)
        record["onetime_negatives_s"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(record))


if __name__ == "__main__":
    main()

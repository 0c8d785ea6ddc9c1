"""Full online-PSO loop A/B bench on the real chip (hard-sync timing).

Measures the two phases of one epoch — pair sampling (incl. decode +
PickScore) and the DPO update — at the reference workload shape
(512^2, 4-step sample / 3 trained, sample bs 4 x 4 batches, train bs 4,
ga 2, LoRA r=32). Weights are random (throughput is value-independent).

Knobs via env:
  PSO_FUSE_REF=1|0     fuse policy+ref into one 4b apply (default 1)
  PSO_REMAT=full|resnets|dots|lowres|lowres_dots|none
  PSO_OFFLOAD=1        park VAE/scorer/TE weights in pinned_host memory
                       during the update phase (the HBM freed is what
                       the dots remat policy needs on a 16GB chip)
  PSO_ATTN=xla|pallas  unet attention impl (default xla)
  PSO_RES=512          resolution
  PSO_STEPS=4          sampling steps

Usage: python -u scripts/bench_full_loop.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SAMPLER = os.environ.get("PSO_SAMPLER", "turbo")  # turbo | dmd
FUSE = os.environ.get("PSO_FUSE_REF", "0") == "1"  # unfused = measured default
REMAT = os.environ.get("PSO_REMAT", "full")
ATTN = os.environ.get("PSO_ATTN", "xla")
RES = int(os.environ.get("PSO_RES", "1024" if SAMPLER == "dmd" else "512"))
STEPS = int(os.environ.get("PSO_STEPS", "4"))
SAMPLE_BS = int(os.environ.get("PSO_SAMPLE_BS", "2" if SAMPLER == "dmd" else "4"))
N_BATCHES = int(os.environ.get("PSO_N_BATCHES", "2" if SAMPLER == "dmd" else "4"))
TRAIN_BS = int(os.environ.get("PSO_TRAIN_BS", "1" if SAMPLER == "dmd" else "4"))
GA = int(os.environ.get("PSO_GA", "4" if SAMPLER == "dmd" else "2"))
# unchunked decode became the DMD2 config default post-GN-fix (configs/
# sdxl_dmd_dpo.py vae_decode_chunk=0; BENCHMARKS.md r3 table)
DECODE_CHUNK = int(os.environ.get("PSO_DECODE_CHUNK", "0"))
OFFLOAD = os.environ.get("PSO_OFFLOAD", "0") == "1"
INT8_REF = os.environ.get("PSO_INT8_REF", "0") == "1"  # int8 frozen-ref pass


def main():
    from pairwise_sample_optimization_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if os.environ.get("PSO_INT8_DECODE") == "1":
        from pairwise_sample_optimization_tpu.ops.qconv import set_use_int8_decode

        set_use_int8_decode(True)
    if SAMPLER == "dmd":
        # mirror configs/sdxl_dmd_dpo.py: the 1024^2 config keeps the
        # tiled GN + subpixel decode on (BENCHMARKS.md)
        from pairwise_sample_optimization_tpu.ops.group_norm import set_use_pallas
        from pairwise_sample_optimization_tpu.ops.upsample import set_use_subpixel

        set_use_pallas(os.environ.get("PSO_FUSED_GN", "1") == "1")
        set_use_subpixel(os.environ.get("PSO_SUBPIXEL", "1") == "1")
    from pairwise_sample_optimization_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )
    from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline
    from pairwise_sample_optimization_tpu.rewards import PickScoreScorer
    from pairwise_sample_optimization_tpu.train import (
        OnlinePSOConfig,
        OnlinePSOTrainer,
        PSOTrainState,
        make_optimizer,
    )

    _REMAT_MODES = ("full", "resnets", "dots", "lowres", "lowres_dots")
    if REMAT in _REMAT_MODES:
        remat = REMAT
    elif REMAT in ("none", ""):
        remat = False
    else:  # a typo must not silently measure a different configuration
        raise SystemExit(f"PSO_REMAT={REMAT!r}: expected {_REMAT_MODES + ('none',)}")
    pipe = SDXLPipeline.random(
        lora_rank=32,
        dtype=jnp.bfloat16,
        resolution=RES,
        fast_init=True,
        param_dtype=jnp.bfloat16,
        remat=remat,
        unet_attention_impl=(ATTN if ATTN != "xla" else None),
    )
    pipe.decode_chunk = DECODE_CHUNK
    scorer = PickScoreScorer(
        text_config=CLIPTextConfig.vit_h14(),
        vision_config=CLIPVisionConfig.vit_h14(),
        fast_init=True,
        param_dtype=jnp.bfloat16,
    )

    def decode_fn(latents, aux):
        return pipe.decode(latents, aux["vae"])

    def reward_fn(images, reward_cond, aux):
        img = scorer._image_features_v(aux["scorer"], images)
        return jnp.sum(reward_cond["text_features"] * img, axis=-1)

    ocfg = OnlinePSOConfig(
        sampler=SAMPLER,
        num_steps=STEPS,
        train_batch_size=TRAIN_BS,
        grad_accum=GA,
        compare="sample" if SAMPLER == "turbo" else "pareto",
        fuse_ref_pass=FUSE,
        int8_ref_pass=INT8_REF,
    )
    trainer = OnlinePSOTrainer(
        ocfg,
        pipe.unet_apply,
        make_optimizer(),
        decode_fn=decode_fn,
        reward_fn=reward_fn,
        latent_hw=RES // 8,
    )
    aux_vars = {"vae": pipe.vae_variables, "scorer": scorer.variables}
    state = PSOTrainState.create(pipe.unet_variables["lora"], make_optimizer())

    ids1 = jnp.ones((SAMPLE_BS, 77), jnp.int32)
    ids2 = jnp.ones((SAMPLE_BS, 77), jnp.int32)
    from pairwise_sample_optimization_tpu.models.sdxl_text import (
        compute_time_ids,
        encode_sdxl_prompt,
    )

    @jax.jit
    def encode(te1_vars, te2_vars, i1, i2):  # weights as jit args, not constants
        e, p = encode_sdxl_prompt(pipe.te1, te1_vars, pipe.te2, te2_vars, i1, i2)
        return {
            "embeds": e, "pooled": p,
            "time_ids": compute_time_ids(i1.shape[0], RES),
        }

    text_feats = jax.jit(scorer._text_features_v)  # weights as jit args
    cond = encode(pipe.te1_variables, pipe.te2_variables, ids1, ids2)
    rc = {
        "text_features": text_feats(
            scorer.variables, jnp.ones((SAMPLE_BS, 77), jnp.int32)
        )
    }

    from pairwise_sample_optimization_tpu.parallel.mesh import move_to_memory_kind

    def one_epoch(state, key, sync=False):
        nonlocal aux_vars
        t0 = time.perf_counter()
        all_s, all_c = [], []
        for b_idx in range(N_BATCHES):
            samples, _ = trainer.sample_pairs(
                {"params": pipe.unet_variables["params"], "lora": state.lora},
                cond, rc, jax.random.fold_in(key, b_idx), aux_variables=aux_vars,
            )
            all_s.append(samples)
            all_c.append(cond)
        samples = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *all_s)
        c = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *all_c)
        np.asarray(samples["log_probs"])  # hard sync (axon: readback only)
        t1 = time.perf_counter()
        if OFFLOAD:  # park sampling-phase-only weights in TPU-host memory
            aux_vars = move_to_memory_kind(aux_vars, "pinned_host")
            pipe.vae_variables = aux_vars["vae"]
            scorer.variables = aux_vars["scorer"]
            pipe.te1_variables = move_to_memory_kind(pipe.te1_variables, "pinned_host")
            pipe.te2_variables = move_to_memory_kind(pipe.te2_variables, "pinned_host")
        state, metrics = trainer.train_epoch(
            state, pipe.unet_variables["params"], samples, c,
            jax.random.fold_in(key, 999),
        )
        np.asarray(jax.tree.leaves(state.lora)[0])  # hard sync
        if OFFLOAD:
            aux_vars = move_to_memory_kind(aux_vars, "device")
            pipe.vae_variables = aux_vars["vae"]
            scorer.variables = aux_vars["scorer"]
            pipe.te1_variables = move_to_memory_kind(pipe.te1_variables, "device")
            pipe.te2_variables = move_to_memory_kind(pipe.te2_variables, "device")
            np.asarray(jax.tree.leaves(aux_vars["vae"])[0][..., :1])  # sync restore
        t2 = time.perf_counter()
        return state, t1 - t0, t2 - t1, metrics

    # compile + warm
    state, ts, tu, m = one_epoch(state, jax.random.key(0))
    print(f"warm: sample {ts:.2f}s update {tu:.2f}s loss={m[0]['loss']:.4f}")

    # roofline accounting: XLA's own FLOP count for each phase program
    def flops_of(jitted, *args):
        try:
            ca = jitted.lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception as e:  # cost analysis unsupported on some backends
            print("cost_analysis unavailable:", e)
            return 0.0

    variables = {"params": pipe.unet_variables["params"], "lora": state.lora}
    f_sample = flops_of(
        trainer._sample, variables, cond, rc, jax.random.key(0), aux_vars
    ) * N_BATCHES
    # one update program processes ga*T microbatches; reconstruct its args
    per_update = TRAIN_BS * GA
    n_updates = (SAMPLE_BS * N_BATCHES) // per_update
    samples1, _ = trainer.sample_pairs(
        variables, cond, rc, jax.random.key(0), aux_variables=aux_vars
    )
    reps = max(per_update // SAMPLE_BS, 1)
    big = jax.tree.map(
        lambda x: jnp.concatenate([x] * reps, 0)[:per_update], samples1
    )
    bigc = jax.tree.map(
        lambda x: jnp.concatenate([x] * reps, 0)[:per_update], cond
    )
    sl = lambda t: jax.tree.map(
        lambda x: x.reshape((GA, TRAIN_BS) + x.shape[1:]), t
    )
    f_update = flops_of(
        trainer._update, state, pipe.unet_variables["params"],
        sl(big), sl(bigc), jax.random.key(0),
    ) * n_updates
    peak = 197e12  # v5e bf16
    if f_sample and f_update:
        print(
            f"flops: sample {f_sample/1e12:.2f} TF, update {f_update/1e12:.2f} TF; "
            f"roofline floor at peak: sample {f_sample/peak:.2f}s "
            f"update {f_update/peak:.2f}s"
        )

    n = 3
    t_s, t_u = [], []
    for i in range(n):
        state, ts, tu, _ = one_epoch(state, jax.random.key(i + 1))
        t_s.append(ts)
        t_u.append(tu)
    ts, tu = float(np.median(t_s)), float(np.median(t_u))
    pairs = SAMPLE_BS * N_BATCHES
    print(
        json.dumps(
            {
                "sampler": SAMPLER,
                "fuse_ref_pass": FUSE,
                "int8_ref_pass": INT8_REF,
                "remat": REMAT,
                "attn": ATTN,
                "resolution": RES,
                "sample_s": round(ts, 3),
                "update_s": round(tu, 3),
                "pairs_per_s": round(pairs / (ts + tu), 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Pod-scaling audit: compile-time evidence the SPMD update program scales.

Real multi-chip hardware is unavailable in this environment (one v5e chip
through the axon tunnel), so the "DP over a mesh scales ~Nx" claim rests
on auditing the REAL update program (``OnlinePSOTrainer._update_impl``,
the code path the shipped runner jits), GSPMD-partitioned for an N-device
mesh of virtual CPU devices:

- per-device FLOPs of the partitioned module must be ~1/N of a 1-device
  compile at the same GLOBAL batch (the compute really splits), and
- cross-device collective traffic must be LoRA-gradient-sized (~MB per
  update), NOT activation- or weight-sized — the all-reduce payload is
  the only recurring ICI cost, so data-parallel scaling stays
  compute-bound, not comm-bound.

Abstract lowering only: no weights materialize (the full-size SDXL UNet
is 2.6B params; ``jax.eval_shape`` + ShapeDtypeStruct inputs keep the
audit runnable on the 1-core host). Results recorded in BENCHMARKS.md
"Pod scaling audit".

Usage:
  python scripts/pod_scaling_audit.py            # tiny UNet, fast
  python scripts/pod_scaling_audit.py --full     # full SDXL UNet @512^2
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEVICES = 8


def _force_cpu(n: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if f"xla_force_host_platform_device_count={n}" not in flags:
        os.environ["XLA_FLAGS"] = flags + f" --xla_force_host_platform_device_count={n}"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge

    xla_bridge._clear_backends()


_DT_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}


def collective_bytes(hlo_text: str) -> dict:
    """Sum output bytes of every cross-device collective in an HLO dump,
    keyed by op kind. Async pairs count the -start only. Collectives that
    sit inside a loop body are tagged separately (they execute once per
    trip, so their static bytes understate the traffic)."""
    out = {}
    in_loop_body = False
    for line in hlo_text.splitlines():
        if line.startswith("%") or line.startswith("ENTRY"):
            # computation header: scan/while bodies are non-ENTRY computations
            in_loop_body = not line.startswith("ENTRY")
        m = re.search(
            r"=\s*([^=]*?)\s*(all-reduce(?:-start)?|all-gather(?:-start)?|"
            r"reduce-scatter|collective-permute(?:-start)?|all-to-all)\(",
            line,
        )
        if not m:
            continue
        lhs, op = m.group(1), m.group(2)
        if op.endswith("-start"):
            op = op[: -len("-start")]
        nbytes = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", lhs):
            if dt not in _DT_BYTES:
                continue
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            nbytes += elems * _DT_BYTES[dt]
        key = op + (" (in loop body)" if in_loop_body else "")
        out[key] = out.get(key, 0) + nbytes
    return out


def build_compiled(n_devices: int, full: bool):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pairwise_sample_optimization_tpu.models import SDXLUNet, UNetConfig
    from pairwise_sample_optimization_tpu.parallel.mesh import MeshSpec, make_mesh
    from pairwise_sample_optimization_tpu.train import (
        OnlinePSOConfig,
        OnlinePSOTrainer,
        PSOTrainState,
        make_optimizer,
    )

    if full:
        ucfg = UNetConfig.sdxl(lora_rank=32)
        hw, ctx, cad, pooled_dim = 64, 77, 2048, 1280  # 512^2 latents
        bs_global, ga = 8, 1
    else:
        ucfg = UNetConfig.tiny(lora_rank=2)
        hw, ctx, cad, pooled_dim = 8, 5, ucfg.cross_attention_dim, ucfg.pooled_embed_dim
        bs_global, ga = 8, 1

    model = SDXLUNet(ucfg)
    mesh = make_mesh(MeshSpec(data=n_devices), jax.devices()[:n_devices])

    cfg = OnlinePSOConfig(
        sampler="turbo",
        num_steps=4,
        train_batch_size=bs_global,
        grad_accum=ga,
    )
    tx = make_optimizer()

    def unet_apply(variables, x, t, cond, lora_scale):
        return model.apply(
            variables, x, t, cond["embeds"], cond["pooled"], cond["time_ids"],
            lora_scale=lora_scale,
        )

    trainer = OnlinePSOTrainer(
        cfg, unet_apply, tx, latent_hw=hw, mesh=mesh, donate=False
    )

    dtype = ucfg.dtype
    var_shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, hw, hw, 4), jnp.float32),
            jnp.zeros((1,), jnp.float32),
            jnp.zeros((1, ctx, cad), dtype),
            jnp.zeros((1, pooled_dim), dtype),
            jnp.zeros((1, 6), jnp.float32),
        )
    )
    state_shapes = jax.eval_shape(
        lambda: PSOTrainState.create(
            jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), var_shapes["lora"]),
            tx,
        )
    )

    T = cfg.train_timesteps
    bs = bs_global
    batch_shapes = {
        "input_latents": ((ga, bs, 2, T, hw, hw, 4), jnp.float32),
        "latents": ((ga, bs, 2, T, hw, hw, 4), jnp.float32),
        "next_latents": ((ga, bs, 2, T, hw, hw, 4), jnp.float32),
        "timesteps": ((ga, bs, T), jnp.float32),
        "step_indices": ((ga, bs, T), jnp.int32),
        "rewards": ((ga, bs, 2, 1), jnp.float32),
    }
    cond_shapes = {
        "embeds": ((ga, bs, ctx, cad), dtype),
        "pooled": ((ga, bs, pooled_dim), dtype),
        "time_ids": ((ga, bs, 6), jnp.float32),
    }

    repl = NamedSharding(mesh, P())

    def sharded_sds(shapes, spec_fn):
        return {
            k: jax.ShapeDtypeStruct(shp, dt, sharding=NamedSharding(mesh, spec_fn(shp)))
            for k, (shp, dt) in shapes.items()
        }

    batch_spec = lambda shp: P(None, "data", *([None] * (len(shp) - 2)))
    batch = sharded_sds(batch_shapes, batch_spec)
    cond = sharded_sds(cond_shapes, batch_spec)

    def repl_sds(tree):
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=repl), tree
        )

    key = jax.random.key(0)
    key_sds = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=repl)
    args = (repl_sds(state_shapes), repl_sds(var_shapes["params"]), batch, cond, key_sds)
    lora_bytes = sum(
        s.size * s.dtype.itemsize for s in jax.tree.leaves(var_shapes["lora"])
    )
    compiled = jax.jit(trainer._update_impl).lower(*args).compile()
    return compiled, lora_bytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="full-size SDXL UNet @512^2")
    ap.add_argument("--devices", type=int, default=N_DEVICES)
    args = ap.parse_args()
    _force_cpu(args.devices)

    rows = []
    for n in (1, args.devices):
        compiled, lora_bytes = build_compiled(n, args.full)
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
        coll = collective_bytes(compiled.as_text())
        rows.append((n, flops, coll))
        print(f"n_devices={n}: per-device flops={flops:.4g}", flush=True)
        for k, v in sorted(coll.items()):
            print(f"  {k}: {v / 1e6:.3f} MB")

    (n1, f1, _), (nn, fn, colln) = rows
    print()
    print(f"LoRA gradient tree: {lora_bytes / 1e6:.3f} MB")
    print(f"per-device FLOP ratio ({nn} dev / 1 dev): {fn / f1:.4f}  (ideal {1/nn:.4f})")
    total_coll = sum(colln.values())
    print(f"total static collective bytes @ {nn} dev: {total_coll / 1e6:.3f} MB")


if __name__ == "__main__":
    main()

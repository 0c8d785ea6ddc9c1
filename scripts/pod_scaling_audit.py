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

Beyond the DP default, ``--modes fsdp,tp`` audits the two beyond-parity
placements the runner ships: FSDP (frozen weights sharded over ``data``;
evidence = per-device weight HBM drops ~1/N while per-device FLOPs stay
~1/N and the recurring collectives become the per-layer weight
all-gathers) and tensor parallelism (width sharding over ``model``;
evidence = per-device FLOPs still ~1/N with activation-sized
all-reduces per block).

Usage:
  python scripts/pod_scaling_audit.py                       # tiny UNet, fast
  python scripts/pod_scaling_audit.py --modes dp,fsdp,tp    # all placements
  python scripts/pod_scaling_audit.py --full --modes fsdp   # full SDXL @512^2
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


def _selftest_collective_parser() -> None:
    """Golden on a synthetic dump: the audit's ~8x-DP-scaling evidence is
    regex-parsed HLO text, which silently undercounts if the dump format
    shifts — pin the parser's behavior so drift is loud (VERDICT r4)."""
    hlo = (
        "ENTRY %main (p0: f32[8]) -> f32[8] {\n"
        "  %ar = f32[1024]{0} all-reduce(f32[1024]{0} %x), replica_groups={}\n"
        "  %ags = (bf16[2,128]{1,0}, bf16[16,128]{1,0}) "
        "all-gather-start(bf16[2,128]{1,0} %y), dimensions={0}\n"
        "  %agd = bf16[16,128]{1,0} all-gather-done((bf16[2,128], "
        "bf16[16,128]) %ags)\n"
        "  %rs = f32[64]{0} reduce-scatter(f32[512]{0} %w), dimensions={0}\n"
        "}\n"
        "%loop_body (p: s32[]) -> s32[] {\n"
        "  %cp = f32[16]{0} collective-permute(f32[16]{0} %z)\n"
        "}\n"
    )
    got = collective_bytes(hlo)
    want = {
        "all-reduce": 4096,
        "all-gather": 4608,  # -start tuple counts in+out; -done not recounted
        "reduce-scatter": 256,
        "collective-permute (in loop body)": 64,
    }
    assert got == want, f"collective_bytes parser drifted: {got} != {want}"


def build_compiled(n_devices: int, full: bool, mode: str = "dp"):
    """Lower + GSPMD-compile the real update program for one placement mode.

    mode:
      dp    — frozen weights replicated, batch over ``data`` (the default
              runner placement; the reference's DDP equivalent)
      fsdp  — frozen weights sharded over ``data`` via
              ``parallel.fsdp.fsdp_param_shardings`` (``mesh.fsdp=True``)
      tp    — UNet width-sharded over a (data, model) mesh via
              ``parallel.tp`` (``mesh.model>1``); 8 devices -> (2, 4),
              the shape the equivalence test pins
    """
    import math

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
    if mode == "tp" and n_devices > 1:
        mp = 4 if n_devices % 4 == 0 and n_devices >= 4 else n_devices
        spec = MeshSpec(data=n_devices // mp, model=mp)
    else:
        spec = MeshSpec(data=n_devices)
    mesh = make_mesh(spec, jax.devices()[:n_devices])

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

    def place_sds(tree, shardings):
        return jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            tree,
            shardings,
        )

    def repl_shardings(tree):
        return jax.tree.map(lambda _: repl, tree)

    # frozen-param + state shardings per placement mode (the exact
    # production sharding functions the runner wires, online_runner.py)
    if mode == "fsdp":
        from pairwise_sample_optimization_tpu.parallel.fsdp import (
            fsdp_param_shardings,
        )

        param_shardings = fsdp_param_shardings(var_shapes["params"], mesh)
        state_shardings = repl_shardings(state_shapes)
    elif mode == "tp":
        from pairwise_sample_optimization_tpu.parallel.tp import (
            tp_state_shardings,
            unet_param_shardings,
        )

        param_shardings = unet_param_shardings({"params": var_shapes["params"]}, mesh)[
            "params"
        ]
        state_shardings = tp_state_shardings(state_shapes, mesh)
    else:
        param_shardings = repl_shardings(var_shapes["params"])
        state_shardings = repl_shardings(state_shapes)

    def per_device_bytes(tree, shardings):
        return sum(
            math.prod(sh.shard_shape(s.shape)) * s.dtype.itemsize
            for s, sh in zip(jax.tree.leaves(tree), jax.tree.leaves(shardings))
        )

    key = jax.random.key(0)
    key_sds = jax.ShapeDtypeStruct(key.shape, key.dtype, sharding=repl)
    args = (
        place_sds(state_shapes, state_shardings),
        place_sds(var_shapes["params"], param_shardings),
        batch,
        cond,
        key_sds,
    )
    lora_bytes = sum(
        s.size * s.dtype.itemsize for s in jax.tree.leaves(var_shapes["lora"])
    )
    weight_bytes = {
        "frozen_total": sum(
            s.size * s.dtype.itemsize for s in jax.tree.leaves(var_shapes["params"])
        ),
        "frozen_per_device": per_device_bytes(var_shapes["params"], param_shardings),
        "state_per_device": per_device_bytes(state_shapes, state_shardings),
    }
    compiled = jax.jit(trainer._update_impl).lower(*args).compile()
    return compiled, lora_bytes, weight_bytes


def audit_one(n: int, full: bool, mode: str):
    compiled, lora_bytes, wbytes = build_compiled(n, full, mode)
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", float("nan")))
    coll = collective_bytes(compiled.as_text())
    print(f"[{mode}] n_devices={n}: per-device flops={flops:.4g}", flush=True)
    print(
        f"  frozen weights: {wbytes['frozen_total'] / 1e9:.3f} GB total, "
        f"{wbytes['frozen_per_device'] / 1e9:.3f} GB/device; "
        f"state {wbytes['state_per_device'] / 1e6:.1f} MB/device"
    )
    for k, v in sorted(coll.items()):
        print(f"  {k}: {v / 1e6:.3f} MB")
    return flops, coll, lora_bytes, wbytes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="full-size SDXL UNet @512^2")
    ap.add_argument("--devices", type=int, default=N_DEVICES)
    ap.add_argument(
        "--modes",
        default="dp",
        help="comma list of placement modes to audit at --devices: dp,fsdp,tp",
    )
    args = ap.parse_args()
    # validate up front: an unknown mode would silently fall through to
    # the dp branch in build_compiled yet print under the typed label —
    # mislabeled audit evidence (ADVICE r4)
    modes = [m.strip() for m in args.modes.split(",") if m.strip()]
    unknown = sorted(set(modes) - {"dp", "fsdp", "tp"})
    if unknown:
        ap.error(f"unknown --modes entries {unknown}; valid: dp,fsdp,tp")
    _selftest_collective_parser()
    _force_cpu(args.devices)

    f1, _, lora_bytes, w1 = audit_one(1, args.full, "dp")
    print()
    for mode in modes:
        fn, colln, _, wn = audit_one(args.devices, args.full, mode)
        total_coll = sum(colln.values())
        # runtime drift guard: with >1 device the dp grad allreduce can't
        # be smaller than ~the LoRA grad tree — near-zero collective bytes
        # means the regex no longer matches this XLA's dump format
        if args.devices > 1 and mode == "dp" and total_coll < 0.1 * lora_bytes:
            raise SystemExit(
                f"collective accounting drift: dp@{args.devices} found only "
                f"{total_coll} collective bytes vs {lora_bytes} LoRA-tree "
                f"bytes — HLO dump format probably changed (update "
                f"collective_bytes + _selftest_collective_parser)"
            )
        print(
            f"  -> FLOP ratio vs 1 dev: {fn / f1:.4f} (ideal {1/args.devices:.4f}); "
            f"static collective bytes {total_coll / 1e6:.3f} MB; "
            f"frozen-weight HBM {w1['frozen_per_device'] / 1e9:.3f} -> "
            f"{wn['frozen_per_device'] / 1e9:.3f} GB/device"
        )
        print(f"  LoRA gradient tree: {lora_bytes / 1e6:.3f} MB")
        print()


if __name__ == "__main__":
    main()

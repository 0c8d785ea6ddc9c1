"""Headline benchmark: online-PSO pairs/sec/chip (SDXL-Turbo 1-step class).

BASELINE.json config 1: SDXL-Turbo 1-step txt2img + PickScore pairwise
ranking over a small PickaPic-style prompt batch — the inference half of
the online PSO loop, end to end on one chip:

  encode prompts (TE1+TE2) -> sample a PAIR of 1-step trajectories
  (2B UNet fwd @512^2, bf16) -> VAE decode (2B images) -> PickScore
  CLIP-H on-device scoring (2B) -> pairwise winner selection

Everything from noise to winner index is ONE jitted program; no host
round-trips. Weights are architecture-true random (throughput does not
depend on values).

Baseline: the reference repo publishes no numbers (BASELINE.md); the
comparison point is an analytic A100 PyTorch fp16 estimate for the same
composite (UNet fwd ~40 ms + VAE decode ~15 ms + CLIP-H ~7 ms per image
at 512^2, batched pair) ~= 12 pairs/s/GPU. vs_baseline = value / 12.
"""

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BATCH = int(os.environ.get("PSO_BENCH_BATCH", "8"))  # prompt pairs per step
RESOLUTION = 512
NUM_STEPS = 1
A100_BASELINE_PAIRS_PER_S = 12.0
# single-chip speed of light for this composite: ~9.3 TFLOP/pair vs the
# v5e's 197 TF/s bf16 peak (BENCHMARKS.md "Roofline") — the defensible
# denominator alongside the +-30%-uncertain analytic A100 point
SOL_PAIRS_PER_S = 21.0

# ----------------------------------------------------------------------
# Drain-proofing (BENCH_r04 post-mortem). After a long full-size run
# exits, the chip reports RESOURCE_EXHAUSTED / Unavailable for ~10-25 min
# while the tunnel drains (CLAUDE.md "CHIP GOTCHA"). The round-4 driver
# bench died to exactly that, 21 min after the builder's last run. Three
# defenses, all testable on CPU (tests/test_bench_retry.py):
#   1. schedule tables are host numpy (ops/schedules.py) so jit lowering
#      never reads device constants back through the tunnel;
#   2. every chip-touching stage runs under `with_retry`: on a transient
#      backend error, wait for a subprocess health probe to pass, then
#      rebuild from scratch (backoff, ~30 min default budget);
#   3. on final failure main() still prints a parseable JSON line with an
#      "error" field instead of a bare traceback.
# ----------------------------------------------------------------------

TRANSIENT_MARKERS = (
    "RESOURCE_EXHAUSTED",
    "ResourceExhausted",
    "UNAVAILABLE",
    "Unavailable",
    "DEADLINE_EXCEEDED",
    "DeadlineExceeded",
    "ABORTED",
    "INTERNAL",
)


def is_transient(exc: BaseException) -> bool:
    """Backend/tunnel errors worth retrying (vs real bugs, which are not)."""
    msg = f"{type(exc).__name__}: {exc}"
    return any(m in msg for m in TRANSIENT_MARKERS)


def probe_chip(timeout_s: float = 240.0) -> bool:
    """Run scripts/tpu_healthy.py in a subprocess (an unhealthy backend can
    burn ~25 min inside init — the subprocess bounds that)."""
    script = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts", "tpu_healthy.py"
    )
    try:
        r = subprocess.run(
            [sys.executable, script],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def with_retry(build, *, budget_s=None, probe=probe_chip, sleep=time.sleep,
               log=lambda m: print(m, file=sys.stderr)):
    """Call ``build()``; on a transient backend error, wait for the chip to
    probe healthy (exponential backoff, total ``budget_s``) and rebuild.

    ``build`` must be idempotent — it re-creates weights and recompiles on
    every attempt, so a half-dead first attempt leaks nothing into the
    retry. Non-transient exceptions propagate immediately.
    """
    if budget_s is None:
        budget_s = float(os.environ.get("PSO_BENCH_RETRY_BUDGET_S", "1800"))
    deadline = time.monotonic() + budget_s
    delay = 30.0
    attempt = 0
    while True:
        attempt += 1
        try:
            return build()
        except Exception as e:  # noqa: BLE001 — filtered by is_transient
            if not is_transient(e) or time.monotonic() >= deadline:
                raise
            log(f"# attempt {attempt} hit transient backend error "
                f"({type(e).__name__}); waiting for chip health "
                f"(budget {deadline - time.monotonic():.0f}s left)")
            while time.monotonic() < deadline:
                sleep(min(delay, max(deadline - time.monotonic(), 0.0)))
                delay = min(delay * 2.0, 240.0)
                if probe():
                    log("# chip probe healthy; retrying")
                    break
            else:
                raise


def measure_rtt_ms(n: int = 10) -> float:
    """Session tunnel RTT: tiny jit dispatch + 1-elem readback, median of n.

    The axon tunnel adds a SESSION-dependent ~0-27 ms per
    dispatch+readback; phase_ms numbers inherit it, so the artifact
    carries the measured RTT for cross-session comparison (phases vary
    +-20-25% between sessions — see BENCHMARKS.md).
    """
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    np.asarray(f(x))  # compile + warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def main(run=None):
    """Print exactly one JSON line; rc 0 on success, 1 with an "error"
    field on final failure (the artifact stays parseable either way)."""
    run = run or _run
    try:
        record = run()
    except Exception as e:  # noqa: BLE001 — last-resort artifact integrity
        import traceback

        traceback.print_exc()
        record = {
            "metric": "online_pso_pairs_per_sec_per_chip",
            "value": None,
            "unit": "pairs/s",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        }
        print(json.dumps(record))
        return 1
    print(json.dumps(record))
    return 0


def _run():
    from pairwise_sample_optimization_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # Gate on a healthy chip BEFORE any in-process device contact: a
    # post-run drain state would otherwise hang/die inside backend init,
    # where no retry is possible (PSO_BENCH_PROBE=0 skips, e.g. on CPU).
    if os.environ.get("PSO_BENCH_PROBE", "1") == "1":
        budget = float(os.environ.get("PSO_BENCH_RETRY_BUDGET_S", "1800"))
        deadline = time.monotonic() + budget
        delay = 30.0
        while not probe_chip():
            if time.monotonic() >= deadline:
                raise RuntimeError(
                    f"TPU probe unhealthy for the whole {budget:.0f}s retry budget"
                )
            print(f"# chip probe unhealthy; sleeping {delay:.0f}s", file=sys.stderr)
            time.sleep(min(delay, max(deadline - time.monotonic(), 0.0)))
            delay = min(delay * 2.0, 240.0)

    t_start = time.perf_counter()

    def stamp(msg):
        print(f"# [{time.perf_counter() - t_start:7.1f}s] {msg}", file=sys.stderr)

    rtt_ms = with_retry(measure_rtt_ms)
    stamp(f"session tunnel RTT: {rtt_ms:.2f} ms")
    # A/B debug knobs (default: package defaults)
    if os.environ.get("PSO_SUBPIXEL"):
        from pairwise_sample_optimization_tpu.ops.upsample import set_use_subpixel

        set_use_subpixel(os.environ["PSO_SUBPIXEL"] == "1")
    if os.environ.get("PSO_FUSED_GN"):
        from pairwise_sample_optimization_tpu.ops.group_norm import set_use_pallas

        set_use_pallas(os.environ["PSO_FUSED_GN"] == "1")
    if os.environ.get("PSO_INT8_DECODE"):
        from pairwise_sample_optimization_tpu.ops.qconv import set_use_int8_decode

        set_use_int8_decode(os.environ["PSO_INT8_DECODE"] == "1")
    if os.environ.get("PSO_INT8_SMOOTH"):
        from pairwise_sample_optimization_tpu.ops.qconv import (
            set_int8_smooth_alpha,
        )

        alpha = float(os.environ["PSO_INT8_SMOOTH"])
        set_int8_smooth_alpha(alpha if alpha > 0 else None)
    if os.environ.get("PSO_INT8_SCORER"):
        from pairwise_sample_optimization_tpu.ops.qconv import set_use_int8_scorer

        set_use_int8_scorer(os.environ["PSO_INT8_SCORER"] == "1")
    from pairwise_sample_optimization_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )
    from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline
    from pairwise_sample_optimization_tpu.rewards import PickScoreScorer
    from pairwise_sample_optimization_tpu.train.sampling import (
        sample_turbo_trajectories,
    )
    from pairwise_sample_optimization_tpu.ops.schedules import (
        make_euler_ancestral_schedule,
    )

    import numpy as np

    def build():
        """Weights -> program -> compile -> first run. Idempotent: called
        again from scratch by with_retry if the chip drops mid-way."""
        stamp("build: pipeline init")
        pipe = SDXLPipeline.random(
            dtype=jnp.bfloat16,
            resolution=RESOLUTION,
            fast_init=True,
            param_dtype=jnp.bfloat16,  # fp16-class weights, as the reference runs
        )
        stamp("build: scorer init")
        scorer = PickScoreScorer(
            text_config=CLIPTextConfig.vit_h14(),
            vision_config=CLIPVisionConfig.vit_h14(),
            fast_init=True,
            param_dtype=jnp.bfloat16,
        )
        stamp("build: weights ready")
        # host numpy tables: lowering embeds them without a device readback
        schedule = make_euler_ancestral_schedule(NUM_STEPS)
        hw = RESOLUTION // 8

        ids1 = jnp.ones((BATCH, 77), jnp.int32)
        ids2 = jnp.ones((BATCH, 77), jnp.int32)
        reward_ids = jnp.ones((BATCH, 77), jnp.int32)

        def program(
            unet_vars, vae_vars, scorer_vars, te1_vars, te2_vars,
            ids1, ids2, reward_ids, key,
        ):
            from pairwise_sample_optimization_tpu.models.sdxl_text import (
                compute_time_ids,
                encode_sdxl_prompt,
            )

            embeds, pooled = encode_sdxl_prompt(
                pipe.te1, te1_vars, pipe.te2, te2_vars, ids1, ids2
            )
            cond = {
                "embeds": jnp.concatenate([embeds, embeds], 0),
                "pooled": jnp.concatenate([pooled, pooled], 0),
                "time_ids": compute_time_ids(2 * BATCH, RESOLUTION),
            }
            k_init, k_step = jax.random.split(key)
            init = jax.random.normal(k_init, (2 * BATCH, hw, hw, 4), jnp.float32)

            def eps_fn(x, t):
                return pipe.unet_apply(unet_vars, x, t, cond, 1.0)

            traj = sample_turbo_trajectories(eps_fn, schedule, init, k_step)
            images = pipe.vae.apply(vae_vars, traj.final_latents, method=pipe.vae.decode)
            txt = scorer._text_features_v(scorer_vars, reward_ids)
            img = scorer._image_features_v(scorer_vars, images)
            scores = jnp.sum(jnp.concatenate([txt, txt], 0) * img, axis=-1)
            s0, s1 = jnp.split(scores, 2)
            winner = (s1 >= s0).astype(jnp.int32)  # ties -> trajectory 1 (ref rule)
            return winner, scores

        # Weights are jit ARGUMENTS (not baked closure constants: that would
        # double HBM and slow compiles) in plain default layouts: measured
        # equal to XLA's AUTO preferred layouts (12.04 vs 12.01 pairs/s) and
        # robust — the AUTO relayout dance is flaky through the axon stack
        # (device_put does not honor some conv-kernel tilings; identity-jit
        # relayout still misses leaves on cache hits). PSO_AUTO_LAYOUT=1
        # re-enables it, with fallback.
        args = (
            pipe.unet_variables,
            pipe.vae_variables,
            scorer.variables,
            pipe.te1_variables,
            pipe.te2_variables,
            ids1,
            ids2,
            reward_ids,
        )

        compiled = None
        if os.environ.get("PSO_AUTO_LAYOUT", "0") == "1":
            try:
                from jax.experimental.layout import Format, Layout

                AUTO = Format(Layout.AUTO)
                n_weight_args = 5  # unet, vae, scorer, te1, te2
                fn = jax.jit(
                    program, in_shardings=(AUTO,) * n_weight_args + (None,) * 4
                )
                auto_compiled = fn.lower(*args, jax.random.key(0)).compile()
                formats = auto_compiled.input_formats[0]

                def relayout(tree, fmt):
                    # one jitted identity per weight tree (per-leaf jits =
                    # hundreds of tiny remote compiles); donation frees each
                    # source buffer as its copy lands
                    y = jax.jit(lambda t: t, out_shardings=fmt, donate_argnums=0)(
                        tree
                    )
                    jax.block_until_ready(y)
                    return y

                # replace args in place as each tree is relaid: relayout
                # donates the source, so on a mid-way failure `args` must
                # keep pointing at whichever buffers are still alive
                args = list(args)
                for i, f in enumerate(formats[:n_weight_args]):
                    args[i] = relayout(args[i], f)
                args = tuple(args)
                winner, _ = auto_compiled(*args, jax.random.key(0))
                np.asarray(winner)  # readback = the only reliable axon sync
                pipe.unet_variables, pipe.vae_variables = args[0], args[1]
                scorer.variables = args[2]
                pipe.te1_variables, pipe.te2_variables = args[3], args[4]
                compiled = auto_compiled
            except ValueError as e:
                args = tuple(args)
                print(f"# AUTO-layout path failed ({type(e).__name__}); "
                      "falling back to default layouts", file=sys.stderr)

        if compiled is None:
            t0 = time.perf_counter()
            compiled = jax.jit(program).lower(*args, jax.random.key(0)).compile()
            print(f"# main program compile: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            winner, _ = compiled(*args, jax.random.key(0))
            np.asarray(winner)
            stamp("build: first run done")
        return pipe, scorer, schedule, args, compiled

    pipe, scorer, schedule, args, compiled = with_retry(build)

    iters = int(os.environ.get("PSO_BENCH_ITERS", "20"))
    t0 = time.perf_counter()
    for i in range(iters):
        winner, scores = compiled(*args, jax.random.key(i + 1))
    np.asarray(winner)  # hard sync on the dependent result
    dt = (time.perf_counter() - t0) / iters

    pairs_per_s = BATCH / dt

    # Measured phase split (PSO_BENCH_PHASES=0 skips). Each phase is an
    # RTT-amortized lax.scan of N calls inside ONE jit — the axon tunnel
    # adds a session-dependent ~0-27 ms per dispatch+readback, so
    # per-call timing of the sub-50ms phases (encode, scorer) is garbage
    # otherwise (CLAUDE.md measurement gotchas).
    stamp("headline iterations done")
    phases = None
    if os.environ.get("PSO_BENCH_PHASES", "1") == "1":
        try:
            phases = _measure_phases(pipe, scorer, schedule, args, stamp=stamp)
        except Exception as e:  # phases are best-effort context
            print(f"# phase split failed: {type(e).__name__}: {e}", file=sys.stderr)
    stamp("phases done")

    record = {
        "metric": "online_pso_pairs_per_sec_per_chip",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / A100_BASELINE_PAIRS_PER_S, 3),
        # fraction of the single-chip speed of light (~21 pairs/s for the
        # ~9.3 TFLOP/pair composite on a 197 TF/s v5e) — the measured
        # claim; vs_baseline divides by an ANALYTIC A100 estimate +-30%
        "sol_fraction": round(pairs_per_s / SOL_PAIRS_PER_S, 3),
        "sol_pairs_per_s": SOL_PAIRS_PER_S,
        # session tunnel RTT (tiny-jit probe). phase_ms numbers inherit a
        # per-dispatch share of this and vary +-20-25% across sessions
        # (observed: pickscore_2b 44.7 vs 54.6 ms, identical code) — compare
        # phases across rounds only with rtt_ms in hand.
        "rtt_ms": round(rtt_ms, 2),
    }
    if phases is not None:
        record["phase_ms"] = phases
    return record


def _measure_phases(pipe, scorer, schedule, args, n=20, stamp=lambda m: None):
    """Per-phase ms for one bench iteration (2B images), each phase as a
    scanned jit. A traced carry perturbs the inputs by a sub-ulp factor so
    XLA cannot hoist the loop-invariant body out of the scan."""
    import numpy as np

    from pairwise_sample_optimization_tpu.models.sdxl_text import (
        compute_time_ids,
        encode_sdxl_prompt,
    )

    unet_vars, vae_vars, scorer_vars, te1_vars, te2_vars, ids1, ids2, reward_ids = args
    hw = RESOLUTION // 8

    def timed(name, fn, *fargs):
        @jax.jit
        def run(fargs):
            def body(acc, _):
                y = fn(acc, *fargs)
                return acc + jnp.mean(y).astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc
        np.asarray(run(fargs))  # compile + warm (readback = reliable sync)
        stamp(f"phase {name}: compiled+warm")
        t0 = time.perf_counter()
        np.asarray(run(fargs))
        stamp(f"phase {name}: measured")
        return (time.perf_counter() - t0) / n * 1e3

    def perturb(x, acc):
        return x * (1.0 + acc * jnp.float32(1e-38)).astype(x.dtype)

    def enc_fn(acc, te1_vars, te2_vars, ids1, ids2):
        # int inputs: a never-true traced comparison defeats loop-invariant
        # hoisting — BOTH id tensors, or the untouched tower is hoisted out
        bump = (acc == jnp.inf)
        ids1 = ids1 + bump.astype(ids1.dtype)
        ids2 = ids2 + bump.astype(ids2.dtype)
        embeds, pooled = encode_sdxl_prompt(
            pipe.te1, te1_vars, pipe.te2, te2_vars, ids1, ids2
        )
        # consume BOTH outputs: pooled alone depends only on TE2, and XLA
        # would dead-code-eliminate the whole TE1 tower
        return pooled.astype(jnp.float32) + jnp.mean(embeds).astype(jnp.float32)

    embeds, pooled = jax.jit(
        lambda v1, v2, i1, i2: encode_sdxl_prompt(pipe.te1, v1, pipe.te2, v2, i1, i2)
    )(te1_vars, te2_vars, ids1, ids2)
    cond = {
        "embeds": jnp.concatenate([embeds, embeds], 0),
        "pooled": jnp.concatenate([pooled, pooled], 0),
        "time_ids": compute_time_ids(2 * BATCH, RESOLUTION),
    }
    x0 = jax.random.normal(jax.random.key(0), (2 * BATCH, hw, hw, 4), jnp.float32)
    tvec = jnp.full((2 * BATCH,), schedule.timesteps[0], jnp.float32)

    def unet_fn(acc, unet_vars, x, tvec, cond):
        return pipe.unet_apply(unet_vars, perturb(x, acc), tvec, cond, 1.0)

    z = x0 * jnp.float32(0.2)
    images = jax.jit(
        lambda v, z: pipe.vae.apply(v, z, method=pipe.vae.decode)
    )(vae_vars, z)

    def dec_fn(acc, vae_vars, z):
        return pipe.vae.apply(vae_vars, perturb(z, acc), method=pipe.vae.decode)

    def score_fn(acc, scorer_vars, images, reward_ids):
        # perturb the ids too: the headline program computes text features
        # inside every iteration, so the phase must keep the text tower in
        # the loop (unperturbed, LICM hoists it and undercounts the phase)
        reward_ids = reward_ids + (acc == jnp.inf).astype(reward_ids.dtype)
        txt = scorer._text_features_v(scorer_vars, reward_ids)
        img = scorer._image_features_v(scorer_vars, perturb(images, acc))
        return jnp.sum(jnp.concatenate([txt, txt], 0) * img, axis=-1)

    return {
        "batch_pairs": BATCH,
        "text_encode": round(timed("enc", enc_fn, te1_vars, te2_vars, ids1, ids2), 2),
        "unet_2b": round(timed("unet", unet_fn, unet_vars, x0, tvec, cond), 2),
        "vae_decode_2b": round(timed("vae", dec_fn, vae_vars, z), 2),
        "pickscore_2b": round(
            timed("pick", score_fn, scorer_vars, images, reward_ids), 2
        ),
    }


if __name__ == "__main__":
    sys.exit(main())

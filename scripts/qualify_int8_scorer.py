"""Ranking-level qualification of the dynamic-int8 scorer image tower.

VERDICT r4 #7 — the last untried quantization surface: the PickScore
CLIP-H IMAGE tower in the sampling phase (7-9% of the headline
iteration; ``pickscore_2b`` ~45 ms). ``CLIPVisionConfig.int8_mlp``
routes the encoder MLP matmuls (fc1/fc2, ~2/3 of tower FLOPs) through
``ops.qconv.int8_matmul`` with the SAME parameter tree as the bf16
tower (models/layers.Int8Dense).

The online loop consumes the scorer ONLY through the pairwise winner
bit, so the qualification metric is the PAIR PREFERENCE FLIP RATE of
sign(s0 - s1) between bf16 and int8 scoring of the same images, plus:

1. image-feature cosine / score deltas (bf16 vs int8 tower);
2. the tower's RTT-amortized phase time (scan of 20 inside one jit —
   per-call numbers are garbage through the axon tunnel, CLAUDE.md);

Weight ENSEMBLES probe where real CLIP-H checkpoints could be worse
than random weights (channel heteroscedasticity through the LayerNorm
affines — the SmoothQuant failure mode; transformer MLP activations are
the textbook outlier-channel case):
  random       lecun-normal everything
  het_ln       vision LN scales lognormal (sigma=1) + shifted biases
  ortho        vision dense kernels re-drawn orthogonal
  het_ln_ortho both

Usage: python scripts/qualify_int8_scorer.py [n_pairs] [ensemble]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

ENSEMBLES = ("random", "het_ln", "ortho", "het_ln_ortho")


def make_ensemble(variables, kind: str, key):
    """Reshape the VISION tower's random weights toward real-checkpoint
    statistics (see module docstring). Identity for kind='random'."""
    if kind not in ENSEMBLES:
        raise SystemExit(f"ensemble {kind!r}: expected one of {ENSEMBLES}")
    if kind == "random":
        return variables
    het = "het_ln" in kind
    ortho = "ortho" in kind
    counter = [0]
    ortho_init = jax.nn.initializers.orthogonal()

    def f(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if names[0] != "params" or names[1] != "vision":
            return leaf
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        is_norm = any("norm" in n for n in names)
        if het and is_norm and names[-1] == "scale":
            return leaf * jnp.exp(jax.random.normal(k, leaf.shape, leaf.dtype))
        if het and is_norm and names[-1] == "bias":
            return leaf + 0.5 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if ortho and names[-1] == "kernel" and leaf.ndim == 2:
            w = ortho_init(k, leaf.shape, jnp.float32)
            rms = jnp.sqrt(jnp.mean(leaf.astype(jnp.float32) ** 2))
            w = w * (rms / jnp.maximum(jnp.sqrt(jnp.mean(w**2)), 1e-12))
            return w.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(f, variables)


def main():
    import dataclasses

    from pairwise_sample_optimization_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )
    from pairwise_sample_optimization_tpu.rewards import PickScoreScorer
    from pairwise_sample_optimization_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ensemble = sys.argv[2] if len(sys.argv) > 2 else "random"
    b = 8  # images per scoring call (one bench-batch half)

    base = PickScoreScorer(
        text_config=CLIPTextConfig.vit_h14(),
        vision_config=CLIPVisionConfig.vit_h14(),
        fast_init=False,  # random weights must be real (zeros score 0)
        param_dtype=jnp.bfloat16,
    )
    base.variables = make_ensemble(base.variables, ensemble, jax.random.key(23))
    quant = PickScoreScorer(
        variables=base.variables,  # same tree — Int8Dense is param-compatible
        text_config=CLIPTextConfig.vit_h14(),
        vision_config=dataclasses.replace(
            CLIPVisionConfig.vit_h14(), int8_mlp=True
        ),
    )

    ids = jnp.asarray(np.random.default_rng(0).integers(1, 49407, (b, 77)))
    text_feats = base.text_features(ids)  # shared: text tower is untouched

    def score_fp(images):
        return np.asarray(base.score_with_text_features(images, text_feats))

    def score_q(images):
        return np.asarray(quant.score_with_text_features(images, text_feats))

    # ---- ranking stability over synthetic "image pairs" ----
    # smooth random fields through the CLIP normalization are the
    # stand-in for decoded images (no real weights in this environment);
    # the paired design cancels the binomial noise between variants
    feat_cos = []
    deltas = []
    flips = 0
    gaps = []
    n_iters = -(-n_pairs // b)
    for it in range(n_iters):
        k = jax.random.fold_in(jax.random.key(1), it)
        # low-frequency content: upsample 32^2 noise to 224^2 so the
        # patch embeds see image-like (correlated) inputs, not white noise
        small = jax.random.normal(k, (2 * b, 32, 32, 3))
        imgs = jax.image.resize(small, (2 * b, 224, 224, 3), "linear")
        imgs = jnp.tanh(imgs)  # [-1, 1] image range
        s_fp = np.concatenate([score_fp(imgs[:b]), score_fp(imgs[b:])])
        s_q = np.concatenate([score_q(imgs[:b]), score_q(imgs[b:])])
        f_fp = np.asarray(base._image_features_v(base.variables, imgs), np.float64)
        f_q = np.asarray(quant._image_features_v(quant.variables, imgs), np.float64)
        feat_cos.extend(np.sum(f_fp * f_q, axis=-1).tolist())
        deltas.extend(np.abs(s_q - s_fp).tolist())
        g0 = s_fp[:b] - s_fp[b:]
        g1 = s_q[:b] - s_q[b:]
        gaps.extend(np.abs(g0).tolist())
        flips += int(np.sum(np.sign(g0) != np.sign(g1)))

    assert np.mean(deltas) > 0, "int8 tower did not engage (scores identical)"

    # ---- RTT-amortized tower phase time (bf16 vs int8), scan of 20 ----
    def timed(scorer):
        def phase(acc, variables, images):
            images = images * (1.0 + acc * jnp.float32(1e-38)).astype(images.dtype)
            return scorer._image_features_v(variables, images)

        n = 20

        @jax.jit
        def run(variables, images):
            def body(acc, _):
                y = phase(acc, variables, images)
                return acc + jnp.mean(y).astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return acc

        imgs = jnp.tanh(jax.random.normal(jax.random.key(5), (2 * b, 224, 224, 3)))
        np.asarray(run(scorer.variables, imgs))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(scorer.variables, imgs))
        return (time.perf_counter() - t0) / n * 1e3

    ms_fp = timed(base)
    ms_q = timed(quant)

    total_pairs = len(gaps)
    out = {
        "ensemble": ensemble,
        "n_pairs": total_pairs,
        "pair_gap_abs_mean": float(np.mean(gaps)),
        "feature_cos_mean": float(np.mean(feat_cos)),
        "feature_cos_min": float(np.min(feat_cos)),
        "pickscore_abs_delta_mean": float(np.mean(deltas)),
        "pickscore_abs_delta_p95": float(np.percentile(deltas, 95)),
        "preference_flips": flips,
        "flip_rate": flips / float(total_pairs),
        "image_tower_ms_bf16": round(ms_fp, 2),
        "image_tower_ms_int8": round(ms_q, 2),
        "tower_speedup": round(ms_fp / ms_q, 3) if ms_q > 0 else None,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

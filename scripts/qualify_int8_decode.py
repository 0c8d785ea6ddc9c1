"""Image-level qualification of the dynamic-int8 VAE decode (512^2).

Round-2 verdict item 5: the +12.6% headline from ``kernels.
int8_vae_decode`` was defended only by per-conv error bands. This
measures what actually matters to the online loop, on the real chip at
full size:

1. SNR/PSNR of the int8 decode vs the fp32-weight decode on the SAME
   latents;
2. the PickScore delta per image induced by int8 decode;
3. the PAIR PREFERENCE FLIP RATE: of N (traj0, traj1) latent pairs,
   how often does sign(s0 - s1) change when both images are decoded
   int8? The online loop consumes the decode ONLY through this ranking.

Random weights (no checkpoints in this environment): the decoder conv
stack and scorer are architecture-true, and quantization error of convs
does not depend on weight realism — noted in BENCHMARKS.md.

Weight ENSEMBLES (round-3 verdict item 7): the stated reason real
checkpoints might behave worse is channel heteroscedasticity introduced
by the GroupNorm affines (SmoothQuant's motivation). The ensembles
reshape the random weights toward those statistics so the bound is
probed where it is supposed to move:
  random       lecun-normal everything (the r3 baseline)
  het_gn       decoder GN scales drawn lognormal (sigma=1, ~30x channel
               spread) + shifted biases -> channel-heteroscedastic
               activations into every conv
  ortho        decoder conv kernels re-drawn orthogonal (structured,
               non-gaussian spectra)
  het_gn_ortho both

Usage: python scripts/qualify_int8_decode.py [n_pairs] [ensemble]
"""

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


ENSEMBLES = ("random", "het_gn", "ortho", "het_gn_ortho")


def make_ensemble(variables, kind: str, key):
    """Reshape the DECODER's random weights toward real-checkpoint
    statistics (see module docstring). Identity for kind='random'."""
    if kind not in ENSEMBLES:
        raise SystemExit(f"ensemble {kind!r}: expected one of {ENSEMBLES}")
    if kind == "random":
        return variables
    het = "het_gn" in kind
    ortho = "ortho" in kind
    counter = [0]
    ortho_init = jax.nn.initializers.orthogonal()

    def f(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        if names[0] != "params" or names[1] != "decoder":
            return leaf
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        is_norm = any("norm" in n for n in names)
        if het and is_norm and names[-1] == "scale":
            # lognormal channel spread (sigma=1 -> ~30x 99% range)
            return leaf * jnp.exp(jax.random.normal(k, leaf.shape, leaf.dtype))
        if het and is_norm and names[-1] == "bias":
            return leaf + 0.5 * jax.random.normal(k, leaf.shape, leaf.dtype)
        if ortho and names[-1] == "kernel" and leaf.ndim == 4:
            # column-orthogonal, rescaled to the original kernel's RMS so
            # activation magnitudes stay in the same regime
            w = ortho_init(k, leaf.shape, jnp.float32)
            rms = jnp.sqrt(jnp.mean(leaf.astype(jnp.float32) ** 2))
            w = w * (rms / jnp.maximum(jnp.sqrt(jnp.mean(w**2)), 1e-12))
            return w.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(f, variables)


def main():
    from pairwise_sample_optimization_tpu.models.clip import (
        CLIPTextConfig,
        CLIPVisionConfig,
    )
    from pairwise_sample_optimization_tpu.ops import qconv
    from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline
    from pairwise_sample_optimization_tpu.rewards import PickScoreScorer
    from pairwise_sample_optimization_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    ensemble = sys.argv[2] if len(sys.argv) > 2 else "random"
    b = 8  # images per decode call (16 per pair batch)

    pipe = SDXLPipeline.random(
        lora_rank=0, resolution=512, fast_init=True, param_dtype=jnp.bfloat16
    )
    scorer = PickScoreScorer(
        text_config=CLIPTextConfig.vit_h14(),
        vision_config=CLIPVisionConfig.vit_h14(),
        fast_init=False,  # random weights must be real (zeros score 0)
        param_dtype=jnp.bfloat16,
    )
    # fast_init pipeline zero-fills weights -> re-init VAE decoder with
    # real random values (zero weights would decode to a constant)
    import flax.linen as _  # noqa: F401

    vae_vars = pipe.vae.init(
        jax.random.key(7), jnp.zeros((1, 8, 8, 4)), method=pipe.vae.decode
    )
    vae_vars = make_ensemble(vae_vars, ensemble, jax.random.key(23))

    # the int8 flag/alpha are read at TRACE time — one jitted decode
    # would bake whichever mode was live at its first call and silently
    # ignore the toggle. Trace one function per mode, under the right
    # flag. Decoding the SAME latents through all three modes gives a
    # PAIRED comparison of the quantizer variants (binomial noise on
    # the flip rate cancels between variants).
    def _decode(z, vv):
        return pipe.vae.apply(vv, z, method=pipe.vae.decode)

    decode_fp = jax.jit(_decode)
    decode_q = jax.jit(lambda z, vv: _decode(z, vv))
    decode_qs = jax.jit(lambda z, vv: _decode(z, vv))  # smoothed variant
    z0 = jnp.zeros((2 * b, 64, 64, 4))
    qconv.set_use_int8_decode(False)
    np.asarray(decode_fp(z0, vae_vars)[0, 0, 0])
    qconv.set_use_int8_decode(True)
    np.asarray(decode_q(z0, vae_vars)[0, 0, 0])
    qconv.set_int8_smooth_alpha(0.5)
    np.asarray(decode_qs(z0, vae_vars)[0, 0, 0])
    qconv.set_int8_smooth_alpha(None)
    qconv.set_use_int8_decode(False)
    ids = jnp.asarray(np.random.default_rng(0).integers(1, 49407, (b, 77)))
    text_feats = scorer.text_features(ids)

    def score(images):
        return np.asarray(scorer.score_with_text_features(images, text_feats))

    variants = {"plain": decode_q, "smooth": decode_qs}
    psnrs = {k: [] for k in variants}
    snrs = {k: [] for k in variants}
    deltas = {k: [] for k in variants}
    flips = {k: 0 for k in variants}
    gaps = []
    for it in range(-(-2 * n_pairs // (2 * b))):
        z = jax.random.normal(
            jax.random.fold_in(jax.random.key(1), it), (2 * b, 64, 64, 4)
        ) / pipe.vae.config.scaling_factor
        img_fp = decode_fp(z, vae_vars)
        a = np.asarray(img_fp, np.float64)
        s_fp = np.concatenate([score(img_fp[:b]), score(img_fp[b:])])
        g0 = s_fp[:b] - s_fp[b:]
        gaps.extend(np.abs(g0).tolist())
        for name, dec in variants.items():
            img_q = dec(z, vae_vars)
            q = np.asarray(img_q, np.float64)
            err = q - a
            snrs[name].append(
                10 * np.log10(np.var(a) / max(np.var(err), 1e-30))
            )
            # PSNR over the [-1,1] image range (peak 2.0)
            psnrs[name].append(
                10 * np.log10(4.0 / max(np.mean(err**2), 1e-30))
            )
            s_q = np.concatenate([score(img_q[:b]), score(img_q[b:])])
            deltas[name].extend(np.abs(s_q - s_fp).tolist())
            g1 = s_q[:b] - s_q[b:]
            flips[name] += int(np.sum(np.sign(g0) != np.sign(g1)))

    # guard: 60+ dB means the int8 path did not actually engage (the
    # trace-time-flag failure mode this script once had)
    for name in variants:
        assert np.mean(snrs[name]) < 60.0, (
            f"int8[{name}] and fp decodes are bit-identical-class "
            f"({np.mean(snrs[name]):.1f} dB) — the int8 path did not engage"
        )
    total_pairs = len(gaps)  # b pairs per iteration
    out = {
        "ensemble": ensemble,
        "n_pairs": total_pairs,
        "pair_gap_abs_mean": float(np.mean(gaps)),
    }
    for name in variants:
        out[name] = {
            "snr_db": float(np.mean(snrs[name])),
            "psnr_db": float(np.mean(psnrs[name])),
            "pickscore_abs_delta_mean": float(np.mean(deltas[name])),
            "pickscore_abs_delta_p95": float(np.percentile(deltas[name], 95)),
            "preference_flips": flips[name],
            "flip_rate": flips[name] / float(total_pairs),
        }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

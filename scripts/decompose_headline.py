"""Decompose the 512^2 headline composite: where does the iteration live?

bench.py's one-program iteration (B=8 pairs): TE encode (b8) -> UNet fwd
(b16, 1 step) -> VAE decode (b16) -> CLIP-H text (b8) + image (b16)
features -> winner. Times each piece as its own jit, hard-synced, vs the
composed program.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from pairwise_sample_optimization_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline
from pairwise_sample_optimization_tpu.rewards import PickScoreScorer
from pairwise_sample_optimization_tpu.models.sdxl_text import compute_time_ids, encode_sdxl_prompt
from pairwise_sample_optimization_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

B = 8
RES = 512
pipe = SDXLPipeline.random(dtype=jnp.bfloat16, resolution=RES, fast_init=True, param_dtype=jnp.bfloat16)
scorer = PickScoreScorer(text_config=CLIPTextConfig.vit_h14(), vision_config=CLIPVisionConfig.vit_h14(), fast_init=True, param_dtype=jnp.bfloat16)
hw = RES // 8
ids = jnp.ones((B, 77), jnp.int32)

def _sync(out):
    # readback of ONE element (device-side slice): full-array np.asarray
    # would ship tens of MB through the axon tunnel and dominate timing
    x = jax.tree.leaves(out)[0]
    np.asarray(x[(0,) * x.ndim])

def timeit(f, *args, reps=6):
    out = f(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); out = f(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)

# 1. TE encode b8
enc = jax.jit(lambda v1, v2, i1, i2: encode_sdxl_prompt(pipe.te1, v1, pipe.te2, v2, i1, i2))
t_enc = timeit(enc, pipe.te1_variables, pipe.te2_variables, ids, ids)
embeds, pooled = enc(pipe.te1_variables, pipe.te2_variables, ids, ids)
print(f"TE encode b{B}: {t_enc*1e3:7.1f} ms", flush=True)

cond = {"embeds": jnp.concatenate([embeds]*2, 0), "pooled": jnp.concatenate([pooled]*2, 0),
        "time_ids": compute_time_ids(2*B, RES)}
x = jax.random.normal(jax.random.key(0), (2*B, hw, hw, 4), jnp.float32)

# 2. UNet fwd b16 (1 step)
t_vec = jnp.full((2*B,), 999, jnp.int32)
un = jax.jit(lambda v, x: pipe.unet_apply(v, x, t_vec, cond, 1.0))
t_unet = timeit(un, pipe.unet_variables, x.astype(jnp.bfloat16))
print(f"UNet fwd b{2*B} @512^2: {t_unet*1e3:7.1f} ms", flush=True)

# 3. VAE decode b16
lat = x / pipe.vae.config.scaling_factor
dec = jax.jit(lambda v, z: pipe.vae.apply(v, z, method=pipe.vae.decode))
t_dec = timeit(dec, pipe.vae_variables, lat)
img = dec(pipe.vae_variables, lat)
print(f"VAE decode b{2*B}: {t_dec*1e3:7.1f} ms", flush=True)

# 4. CLIP-H text b8 / image b16 features
txt = jax.jit(scorer._text_features_v)
t_txt = timeit(txt, scorer.variables, ids)
print(f"CLIP-H text b{B}: {t_txt*1e3:7.1f} ms", flush=True)
imf = jax.jit(scorer._image_features_v)
t_img = timeit(imf, scorer.variables, img)
print(f"CLIP-H image b{2*B}: {t_img*1e3:7.1f} ms", flush=True)

tot = t_enc + t_unet + t_dec + t_txt + t_img
print(f"sum of parts: {tot*1e3:7.1f} ms -> {B/tot:.2f} pairs/s equivalent", flush=True)
print("DECOMP_OK", flush=True)

"""Standalone txt2img generation CLI (SDXL-Turbo / DMD2 samplers).

The reference exposes generation only inside training/eval scripts; this
gives framework users a direct entry:

  python -m pairwise_sample_optimization_tpu.cli.generate \
      --model_dir /path/to/sdxl-turbo --prompt "a corgi on a beach" \
      --num_steps 4 --out out/
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoints import import_lora_safetensors
from ..pipeline import SDXLPipeline
from ..utils import get_logger

logger = get_logger("pso.generate")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", default="")
    p.add_argument("--lora_path", default="")
    p.add_argument("--lora_rank", type=int, default=32)
    p.add_argument("--bpe_path", default=os.environ.get("PSO_BPE_PATH", ""))
    p.add_argument("--prompt", action="append", required=True,
                   help="repeatable; one image per prompt")
    p.add_argument("--sampler", choices=["turbo", "dmd"], default="turbo")
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="generated")
    p.add_argument("--tiny", action="store_true", help="toy models (smoke/CI)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.model_dir:
        pipe = SDXLPipeline.from_torch_dir(
            args.model_dir, lora_rank=args.lora_rank,
            resolution=args.resolution, bpe_path=args.bpe_path,
            param_dtype=jnp.bfloat16,
        )
    else:
        logger.warning("no --model_dir: random weights (smoke mode)")
        pipe = SDXLPipeline.random(
            lora_rank=args.lora_rank, resolution=args.resolution,
            bpe_path=args.bpe_path, tiny=args.tiny,
            fast_init=not args.tiny,
            param_dtype=None if args.tiny else jnp.bfloat16,
        )
    if args.lora_path:
        pipe.unet_variables["lora"] = import_lora_safetensors(
            args.lora_path, pipe.unet_variables["lora"]
        )

    from ..data import make_clip_tokenizers

    tok1, tok2 = make_clip_tokenizers(args.bpe_path, pipe.te1.config.vocab_size)

    cond = pipe.encode_prompt(
        jnp.asarray(tok1(args.prompt)), jnp.asarray(tok2(args.prompt))
    )
    gen = pipe.generate if args.sampler == "turbo" else pipe.generate_dmd
    images = gen(cond, jax.random.key(args.seed), num_steps=args.num_steps)

    os.makedirs(args.out, exist_ok=True)
    arr = ((np.asarray(images) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
    paths = []
    try:
        from PIL import Image

        for i, a in enumerate(arr):
            path = os.path.join(args.out, f"{i:03d}.png")
            Image.fromarray(a).save(path)
            paths.append(path)
    except ImportError:
        path = os.path.join(args.out, "images.npy")
        np.save(path, arr)
        paths.append(path)
    for p_ in paths:
        logger.info("wrote %s", p_)
    return paths


if __name__ == "__main__":
    main()

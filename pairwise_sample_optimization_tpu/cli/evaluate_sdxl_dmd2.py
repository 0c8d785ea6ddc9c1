"""PickaPic-test evaluation of SDXL-DMD2 (+PSO LoRA) — entry-point parity
with the reference ``evaluate_sdxl_dmd2.py``.

Protocol (reference ``:50-131,169-236``): 4-step DMD2 generation on the
fixed lattice [999,749,499,249] at guidance 0, one image per prompt over
the eval prompt set sharded round-robin across processes (pad the last
shard, gather, truncate), scored with PickScore, CLIP score, ImageReward
and the LAION aesthetic model; report means.

Weights: local diffusers-layout dirs via --model_dir/--lora_path (the
framework does no network I/O); absent weights run the protocol with
random towers (pipeline smoke / throughput mode).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..checkpoints import import_lora_safetensors
from ..data import PromptDataset
from ..models.clip import CLIPTextConfig, CLIPVisionConfig
from ..parallel.collectives import round_robin_gather
from ..pipeline import SDXLPipeline
from ..rewards import AestheticScorer, CLIPScorer, PickScoreScorer
from ..utils import get_logger

logger = get_logger("pso.eval")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", default="", help="local diffusers SDXL dir")
    p.add_argument("--lora_path", default="", help="pytorch_lora_weights.safetensors")
    p.add_argument("--lora_rank", type=int, default=16)
    p.add_argument("--bpe_path", default=os.environ.get("PSO_BPE_PATH", ""))
    p.add_argument("--prompts_json", default="",
                   help="eval prompt list: json, newline .txt, or a packaged "
                        'set ("4k", "imagereward")')
    p.add_argument("--hf_dataset", default="",
                   help="HF datasets source: hub name (reference "
                        "yuvalkirstain/pickapic_v1_no_images; needs network) "
                        "or a local save_to_disk dir")
    p.add_argument("--split", default="test_unique")
    p.add_argument("--caption_column", default="caption")
    p.add_argument("--max_prompts", type=int, default=0, help="0 = all")
    p.add_argument("--resolution", type=int, default=1024)
    p.add_argument("--num_steps", type=int, default=4)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--scorers",
        default="pickscore,clip,aesthetic",
        help="comma list: pickscore,clip,aesthetic,imagereward,hps",
    )
    # scorer weights (reference loads real models, :228-236; absent ->
    # random towers, protocol smoke mode)
    p.add_argument("--pickscore_dir", default="",
                   help="HF CLIPModel dir/file (yuvalkirstain/PickScore_v1)")
    p.add_argument("--clip_dir", default="",
                   help="HF CLIPModel dir/file (laion CLIP-ViT-H-14)")
    p.add_argument("--hps_path", default="",
                   help="HPS_v2_compressed.pt (open_clip format, auto-detected)")
    p.add_argument("--aesthetic_mlp_path", default="",
                   help='sac+logos+ava1-l14-linearMSE.pth; "packaged" = '
                        "the vendored released copy (rewards/assets)")
    p.add_argument("--aesthetic_clip_dir", default="",
                   help="HF CLIPModel dir/file (openai/clip-vit-large-patch14)")
    p.add_argument("--imagereward_path", default="",
                   help="ImageReward-v1.0 .pt checkpoint")
    p.add_argument("--clip_resize_max_size", action="store_true",
                   help="use open_clip's ResizeMaxSize (longest-side+pad) "
                        "transform for the CLIP scorer — exact parity with "
                        "the reference's light_augmentation eval transform "
                        "on non-square inputs (clip_utils.py:18-37)")
    p.add_argument("--gelu_exact", action="store_true",
                   help="force exact erf GELU under bf16 (strict scorer "
                        "parity vs the torch reference)")
    p.add_argument("--output_json", default="")
    p.add_argument(
        "--offload_scorers", action="store_true",
        help="park scorer weights in TPU-host (pinned) memory and stage "
             "each scorer on-device only for its scoring call — the full "
             "5-scorer set (3x CLIP-H + CLIP-L + BLIP-L/BERT, ~9 GB bf16) "
             "does not cohabit a 16 GB chip with the SDXL pipeline "
             "(reference keeps 4 resident on an 80 GB A100, :228-236)",
    )
    p.add_argument("--tiny", action="store_true", help="toy models (smoke/CI)")
    p.add_argument(
        "--timing", action="store_true",
        help="measure per-batch generation / staging / scoring wall time "
             "(adds readback syncs between phases — throughput numbers "
             "come from these runs, parity numbers from untimed runs)",
    )
    p.add_argument("--wordpiece_vocab", default="", help="bert vocab.txt for ImageReward")
    p.add_argument(
        "--score_chunk", type=int, default=0,
        help="stage each scorer once per N prompts instead of once per "
             "batch (0 = per batch): buffers the chunk's generated images "
             "on device, so with --offload_scorers the per-scorer "
             "host->device staging traffic is divided by N/batch_size. "
             "Scores are bit-identical to the unchunked path (generation "
             "order, keys and scorer math are unchanged).",
    )
    p.add_argument(
        "--vae_decode_chunk", type=int, default=-1,
        help="decode N images at a time (-1 = auto: 1 at >=1024^2)",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # ---- prompts, sharded round-robin with pad math (ref :216-224) ----
    dataset = PromptDataset(
        args.prompts_json or None,
        caption_key=args.caption_column,
        # --split applies to dict-of-splits prompt JSONs (the PickaPic
        # test_unique export layout) as well as HF datasets; plain-list
        # JSONs ignore it inside PromptDataset
        split=args.split if (args.hf_dataset or args.prompts_json) else None,
        hf_dataset=args.hf_dataset or None,
    )
    prompts = dataset.prompts
    if args.max_prompts:
        prompts = prompts[: args.max_prompts]
    n_total = len(prompts)
    n_proc, rank = jax.process_count(), jax.process_index()
    shard = prompts[rank::n_proc]
    # pad so every process runs the same number of batches
    per = -(-n_total // n_proc)
    while len(shard) < per:
        shard.append(shard[-1] if shard else "")

    # ---- models ----
    if args.model_dir:
        pipe = SDXLPipeline.from_torch_dir(
            args.model_dir,
            lora_rank=args.lora_rank,
            resolution=args.resolution,
            bpe_path=args.bpe_path,
            # --tiny + --model_dir: port a tiny-layout checkpoint (the
            # parity-protocol smoke drives the real script this way)
            tiny=args.tiny,
            # the full SDXL + scorer weight set only fits a 16GB chip in
            # half precision (same as the smoke branch below)
            param_dtype=None if args.tiny else jnp.bfloat16,
        )
    else:
        logger.warning("no --model_dir: random weights (protocol smoke mode)")
        pipe = SDXLPipeline.random(
            lora_rank=args.lora_rank,
            resolution=args.resolution,
            bpe_path=args.bpe_path,
            tiny=args.tiny,
            fast_init=not args.tiny,
            param_dtype=None if args.tiny else jnp.bfloat16,
        )
    if args.lora_path:
        pipe.unet_variables["lora"] = import_lora_safetensors(
            args.lora_path, pipe.unet_variables["lora"]
        )
        logger.info("loaded PSO LoRA from %s", args.lora_path)
    if args.vae_decode_chunk == -1:
        # 1024^2 decoder activations need chunking on a 16GB chip
        pipe.decode_chunk = 1 if args.resolution >= 1024 and not args.tiny else 0
    else:
        pipe.decode_chunk = args.vae_decode_chunk

    from ..data import make_clip_tokenizers

    tok1, tok2, tok_r = make_clip_tokenizers(
        args.bpe_path, pipe.te1.config.vocab_size, with_reward=True
    )

    if args.gelu_exact:
        from ..models.layers import set_gelu_exact

        set_gelu_exact(True)

    if args.tiny:
        sc_text, sc_vision = CLIPTextConfig.tiny(), CLIPVisionConfig.tiny()
        sc_kwargs = {}
    else:
        sc_text, sc_vision = CLIPTextConfig.vit_h14(), CLIPVisionConfig.vit_h14()
        sc_kwargs = {"fast_init": not args.model_dir, "param_dtype": jnp.bfloat16}
    wanted = set(args.scorers.split(","))
    scorers = {}

    def _dual_scorer(cls, weight_path, name, **extra):
        kw = dict(sc_kwargs)
        if weight_path and "fast_init" in kw:
            # the strict loader replaces every leaf — minutes of random
            # init on the 1-core host would be thrown away
            kw["fast_init"] = True
        scorer = cls(text_config=sc_text, vision_config=sc_vision, **kw, **extra)
        if weight_path:
            from ..checkpoints import load_hf_clip_dual

            scorer.variables = load_hf_clip_dual(weight_path, scorer.variables)
            logger.info("loaded %s weights from %s", name, weight_path)
        return scorer

    if "pickscore" in wanted:
        scorers["pickscore"] = _dual_scorer(
            PickScoreScorer, args.pickscore_dir, "PickScore"
        )
    if "clip" in wanted:
        scorers["clip"] = _dual_scorer(
            CLIPScorer, args.clip_dir, "CLIP",
            preprocess="max_size" if args.clip_resize_max_size else "resize",
        )
    if "hps" in wanted:
        from ..rewards import HPSScorer

        # HPS_v2_compressed.pt is open_clip-format; load_hf_clip_dual
        # auto-detects and converts (checkpoints/clip_loader.py)
        scorers["hps"] = _dual_scorer(HPSScorer, args.hps_path, "HPSv2")
    if "aesthetic" in wanted:
        aes = AestheticScorer(
            vision_config=CLIPVisionConfig.tiny() if args.tiny else None,
            # the loader replaces the CLIP-L tower leaf-for-leaf
            fast_init=bool(args.aesthetic_clip_dir),
        )
        if args.aesthetic_clip_dir:
            from ..checkpoints import load_clip_vision

            aes.vision_variables = load_clip_vision(
                args.aesthetic_clip_dir, aes.vision_variables
            )
            logger.info(
                "loaded aesthetic CLIP-L tower from %s", args.aesthetic_clip_dir
            )
        if args.aesthetic_mlp_path:
            from ..checkpoints import load_aesthetic_mlp
            from ..rewards.aesthetic import packaged_mlp_path

            mlp_path = (
                packaged_mlp_path()
                if args.aesthetic_mlp_path == "packaged"
                else args.aesthetic_mlp_path
            )
            aes.mlp_variables = load_aesthetic_mlp(mlp_path, aes.mlp_variables)
            logger.info(
                "loaded aesthetic MLP from %s", args.aesthetic_mlp_path
            )
        scorers["aesthetic"] = aes
    ir_tok = None
    if "imagereward" in wanted:
        from ..data.wordpiece import WordPieceTokenizer
        from ..models.bert import BertConfig
        from ..models.vit import ViTConfig
        from ..rewards.imagereward import ImageRewardScorer

        if args.tiny:
            scorers["imagereward"] = ImageRewardScorer(
                vit_config=ViTConfig.tiny(), bert_config=BertConfig.tiny()
            )
            ir_tok = WordPieceTokenizer(
                vocab=["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
                + [chr(c) for c in range(ord("a"), ord("z") + 1)],
                context_length=35,
            )
        elif args.wordpiece_vocab and os.path.exists(args.wordpiece_vocab):
            # fast zeros-init whenever the released weights replace every
            # leaf anyway; real random init only for weightless smoke runs
            ir = ImageRewardScorer(
                fast_init=bool(args.imagereward_path) or not args.model_dir
            )
            if args.imagereward_path:
                from ..checkpoints import load_imagereward

                ir.vit_variables, ir.bert_variables, ir.mlp_variables = (
                    load_imagereward(
                        args.imagereward_path,
                        ir.vit_variables,
                        ir.bert_variables,
                        ir.mlp_variables,
                    )
                )
                logger.info(
                    "loaded ImageReward weights from %s", args.imagereward_path
                )
            scorers["imagereward"] = ir
            ir_tok = WordPieceTokenizer(args.wordpiece_vocab)
        else:
            logger.warning(
                "ImageReward needs --wordpiece_vocab (bert vocab.txt); skipping"
            )

    # --offload_scorers: every scorer weight tree lives in pinned_host
    # between uses; _staged() brings one scorer's trees on-device around
    # its scoring call. Generation then has the chip to itself.
    _VAR_ATTRS = (
        "variables", "vision_variables", "mlp_variables",
        "vit_variables", "bert_variables",
    )

    def _move_scorer(scorer, kind):
        from ..parallel.mesh import move_to_memory_kind

        for attr in _VAR_ATTRS:
            tree = getattr(scorer, attr, None)
            if tree is not None:
                setattr(scorer, attr, move_to_memory_kind(tree, kind))

    def _sync_one_leaf(scorer):
        """Realize the staging copies (1-element readback — the only
        reliable axon sync) so --timing attributes them to the stage."""
        for attr in _VAR_ATTRS:
            tree = getattr(scorer, attr, None)
            if tree is not None:
                np.asarray(jax.tree.leaves(tree)[0].ravel()[:1])
                return

    @contextlib.contextmanager
    def _staged(scorer, stage_times=None):
        if not args.offload_scorers:
            yield
            return
        # weights are immutable during eval: restore the STASHED pinned
        # trees instead of re-copying device->host every batch (halves the
        # staging traffic; the device copies free when replaced)
        parked = {
            attr: getattr(scorer, attr)
            for attr in _VAR_ATTRS
            if getattr(scorer, attr, None) is not None
        }
        t0 = time.perf_counter()
        _move_scorer(scorer, "device")
        if stage_times is not None:
            _sync_one_leaf(scorer)
            stage_times.append(time.perf_counter() - t0)
        try:
            yield
        finally:
            for attr, tree in parked.items():
                setattr(scorer, attr, tree)

    if args.offload_scorers:
        for s in scorers.values():
            _move_scorer(s, "pinned_host")

    # weights enter as jit ARGUMENTS: jitting the bound methods would
    # capture the towers as trace-time constants (zero-filled smoke
    # weights would then constant-fold, and real weights risk HBM
    # duplication in the executable)
    encode = jax.jit(pipe.encode_prompt_v)
    generate = jax.jit(
        lambda uv, vv, cond, keys: pipe.generate_dmd(
            cond, None, num_steps=args.num_steps, sample_keys=keys,
            unet_variables=uv, vae_variables=vv,
        )
    )

    # ---- generation + scoring: each prompt's noise is keyed by its
    # GLOBAL index, so the sharded run is bit-identical to single-process
    # (the round-robin gather then restores dataset order) ----
    results = {name: [] for name in scorers}
    timing = None
    if args.timing:
        timing = {
            "batch_s": [],  # per scoring chunk: total wall
            "chunk_prompts": [],  # per scoring chunk: generated prompts
            "gen_s": [],  # per batch: encode+generate (readback-synced)
            "stage_s": {n: [] for n in scorers},  # per chunk per scorer
            "score_s": {n: [] for n in scorers},
        }
    root_key = jax.random.key(args.seed)
    bs = args.batch_size
    # --score_chunk: amortize scorer staging over ceil(chunk/bs) batches.
    # chunk == bs (the default) is exactly the old per-batch behavior —
    # one code path, and chunked scores are bit-identical either way
    # (generation order, per-prompt keys and scorer math don't change;
    # only when the scorer weights ride host->device does).
    chunk = args.score_chunk if args.score_chunk > 0 else bs
    if chunk % bs:
        chunk += bs - (chunk % bs)
    for cstart in range(0, len(shard), chunk):
        n_chunk = min(chunk, len(shard) - cstart)
        t_chunk = time.perf_counter()
        buffered = []  # per batch: (images on device, retrieval ids, prompts)
        for start in range(cstart, cstart + n_chunk, bs):
            batch_prompts = shard[start : start + bs]
            if len(batch_prompts) < bs:
                batch_prompts = batch_prompts + [batch_prompts[-1]] * (
                    bs - len(batch_prompts)
                )
            t_gen = time.perf_counter()
            cond = encode(
                pipe.te1_variables, pipe.te2_variables,
                jnp.asarray(tok1(batch_prompts)), jnp.asarray(tok2(batch_prompts)),
            )
            global_idx = jnp.asarray(
                [rank + n_proc * (start + j) for j in range(bs)], jnp.int32
            )
            keys = jax.vmap(lambda i: jax.random.fold_in(root_key, i))(global_idx)
            images = generate(pipe.unet_variables, pipe.vae_variables, cond, keys)
            if timing is not None:
                np.asarray(images.ravel()[:1])  # sync: charge gen to gen
                timing["gen_s"].append(time.perf_counter() - t_gen)
            buffered.append((images, jnp.asarray(tok_r(batch_prompts)), batch_prompts))
        for name, scorer in scorers.items():
            stage_times = timing["stage_s"][name] if timing is not None else None
            t_sc = time.perf_counter()
            with _staged(scorer, stage_times):
                for images, r_ids, batch_prompts in buffered:
                    if name == "aesthetic":
                        s = scorer.score(images)
                    elif name == "imagereward":
                        wp_ids, wp_mask = ir_tok(batch_prompts)
                        s = scorer.score(
                            images, jnp.asarray(wp_ids), jnp.asarray(wp_mask)
                        )
                    else:
                        s = scorer.score(images, r_ids)
                    # readback inside the stage: the park must not race the
                    # scoring dispatch (axon: only value readback syncs)
                    results[name].append(np.asarray(s)[: len(batch_prompts)])
            if timing is not None:
                dt = time.perf_counter() - t_sc
                st = timing["stage_s"][name]
                timing["score_s"][name].append(dt - (st[-1] if st else 0.0))
        if timing is not None:
            timing["batch_s"].append(time.perf_counter() - t_chunk)
            timing["chunk_prompts"].append(len(buffered) * bs)
        done = min(cstart + n_chunk, len(shard))
        if chunk > bs or done % (10 * bs) < bs:
            logger.info("[%d/%d] prompts evaluated", done, len(shard))

    # ---- cross-process gather -> restore round-robin order -> truncate ->
    # means (ref :99-130; per-prompt scores land on their own prompts) ----
    summary = {}
    per_prompt = {}
    for name, chunks in results.items():
        local = np.concatenate(chunks)[:per]
        gathered = round_robin_gather(local, n_total)
        per_prompt[name] = [float(x) for x in gathered]
        summary[f"{name}_mean"] = float(np.mean(gathered))
        logger.info("%s on eval set: %.8f", name, summary[f"{name}_mean"])

    timing_summary = None
    if timing is not None and len(timing["batch_s"]) > 0:
        # chunk 0 carries every compile; steady state = the rest
        steady = timing["batch_s"][1:] or timing["batch_s"]
        steady_prompts = timing["chunk_prompts"][1:] or timing["chunk_prompts"]
        mean_batch = float(np.mean(steady))
        timing_summary = {
            "compile_batch_s": round(timing["batch_s"][0], 2),
            "steady_batch_s": round(mean_batch, 3),
            "score_chunk": chunk,
            "prompts_per_min": round(
                60.0 * float(np.sum(steady_prompts)) / float(np.sum(steady)), 2
            ),
            "gen_s": round(float(np.mean(timing["gen_s"][1:] or timing["gen_s"])), 3),
            "stage_s": {
                n: round(float(np.mean(v[1:] or v)), 3) if v else 0.0
                for n, v in timing["stage_s"].items()
            },
            "score_s": {
                n: round(float(np.mean(v[1:] or v)), 3)
                for n, v in timing["score_s"].items()
            },
        }
        if args.offload_scorers:
            steady_stage = sum(timing_summary["stage_s"].values())
            timing_summary["staging_share"] = round(steady_stage / mean_batch, 3)
        logger.info("timing: %s", timing_summary)

    if rank == 0 and args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(
                {
                    "n_prompts": n_total,
                    **summary,
                    **({"timing": timing_summary} if timing_summary else {}),
                    "per_prompt": {
                        "prompts": prompts,
                        **per_prompt,
                    },
                },
                f,
                indent=2,
            )
    if timing_summary is not None:
        print(json.dumps({"timing": timing_summary}))
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()

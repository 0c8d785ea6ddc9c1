"""End-to-end CLI smoke tests on tiny models (CPU).

These drive the actual entry points the reference exposes
(train_online_pso_sdxl_turbo / _dmd2, evaluate_sdxl_dmd2,
train_pso_sdxl_turbo_dreambooth) through their public interfaces.
"""

import json
import os

import numpy as np
import pytest


def _tiny_online_config(tmp_path, sampler):
    from pairwise_sample_optimization_tpu.configs import dmd_config, turbo_config

    config = turbo_config() if sampler == "turbo" else dmd_config()
    config.tiny_model = True
    config.mixed_precision = "no"
    config.sample.resolution = 16
    config.sample.batch_size = 2
    config.sample.num_batches_per_epoch = 1
    config.train.batch_size = 2
    config.train.gradient_accumulation_steps = 1
    config.train.lora_rank = 2
    config.checkpointing_steps = 1
    config.validation_steps = 0  # validation covered by its own test
    config.val_max_prompts = 4
    config.output_dir = str(tmp_path)
    config.run_name = f"smoke_{sampler}"
    return config


@pytest.mark.parametrize("sampler", ["turbo", "dmd"])
def test_online_runner_tiny(tmp_path, sampler):
    from pairwise_sample_optimization_tpu.cli.online_runner import run_online_pso

    config = _tiny_online_config(tmp_path, sampler)
    state, history = run_online_pso(config, sampler=sampler, num_epochs=1)
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    # on-policy first update anchor
    np.testing.assert_allclose(history[0]["loss"], np.log(2.0), rtol=1e-3)
    out = os.path.join(str(tmp_path), f"smoke_{sampler}")
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(
        os.path.join(out, "lora-1", "pytorch_lora_weights.safetensors")
    )


def test_online_runner_offload_aux(tmp_path):
    """offload_aux_during_update round-trips the VAE/scorer/TE suites
    through pinned_host memory without perturbing the on-policy anchor."""
    from pairwise_sample_optimization_tpu.cli.online_runner import run_online_pso

    config = _tiny_online_config(tmp_path, "turbo")
    config.run_name = "smoke_offload"
    config.offload_aux_during_update = True
    state, history = run_online_pso(config, sampler="turbo", num_epochs=2)
    np.testing.assert_allclose(history[0]["loss"], np.log(2.0), rtol=1e-3)
    assert all(np.isfinite(h["loss"]) for h in history)


def test_move_to_memory_kind_roundtrip():
    import jax
    import jax.numpy as jnp

    from pairwise_sample_optimization_tpu.parallel.mesh import move_to_memory_kind

    tree = {"a": jnp.ones((8, 8)), "b": jnp.arange(4.0)}
    host = move_to_memory_kind(tree, "pinned_host")
    assert all(x.sharding.memory_kind == "pinned_host" for x in jax.tree.leaves(host))
    back = move_to_memory_kind(host, "device")
    for k in tree:
        assert back[k].sharding.memory_kind == "device"
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(tree[k]))


@pytest.mark.parametrize("mode", ["dots", "lowres_dots"])
def test_online_runner_remat_modes(tmp_path, mode):
    """Policy/per-level remat reaches the UNet from the config knob and
    preserves the on-policy loss==log(2) anchor."""
    from pairwise_sample_optimization_tpu.cli.online_runner import run_online_pso

    config = _tiny_online_config(tmp_path, "turbo")
    config.run_name = f"smoke_remat_{mode}"
    config.activation_checkpoint = mode
    state, history = run_online_pso(config, sampler="turbo", num_epochs=1)
    np.testing.assert_allclose(history[0]["loss"], np.log(2.0), rtol=1e-3)


def test_online_runner_validation(tmp_path):
    import json

    from pairwise_sample_optimization_tpu.cli.online_runner import run_online_pso

    config = _tiny_online_config(tmp_path, "turbo")
    config.validation_steps = 1  # validate on the single update
    run_online_pso(config, sampler="turbo", num_epochs=1)
    metrics_path = os.path.join(str(tmp_path), "smoke_turbo", "metrics.jsonl")
    with open(metrics_path) as f:
        records = [json.loads(line) for line in f]
    val = [r for r in records if "val/pickscore" in r]
    assert val, "validation metrics missing"
    assert np.isfinite(val[0]["val/pickscore"])
    assert np.isfinite(val[0]["val/clip_score"])
    # first validation images saved as PNGs (ref parity)
    img_dir = os.path.join(str(tmp_path), "smoke_turbo", "val-1")
    assert os.path.isdir(img_dir) and len(os.listdir(img_dir)) > 0


def test_online_runner_resume(tmp_path):
    from pairwise_sample_optimization_tpu.cli.online_runner import run_online_pso

    config = _tiny_online_config(tmp_path, "turbo")
    state1, _ = run_online_pso(config, sampler="turbo", num_epochs=1)
    config.resume_from = os.path.join(str(tmp_path), "smoke_turbo")
    state2, _ = run_online_pso(config, sampler="turbo", num_epochs=1)
    assert int(state2.step) == int(state1.step) + 1


def test_evaluate_cli_tiny(tmp_path):
    from pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 import main

    out = str(tmp_path / "eval.json")
    summary = main(
        [
            "--tiny",
            "--resolution=16",
            "--batch_size=2",
            "--max_prompts=4",
            "--num_steps=4",
            "--scorers=pickscore,clip,aesthetic",
            f"--output_json={out}",
        ]
    )
    assert set(summary) == {"pickscore_mean", "clip_mean", "aesthetic_mean"}
    assert all(np.isfinite(v) for v in summary.values())
    with open(out) as f:
        report = json.load(f)
    assert report["n_prompts"] == 4
    assert len(report["per_prompt"]["pickscore"]) == 4
    assert len(report["per_prompt"]["prompts"]) == 4


def test_evaluate_cli_offload_scorers_matches_resident(tmp_path):
    """--offload_scorers (pinned_host staging for the 5-scorer 16GB
    cotenancy) must reproduce the resident run's scores exactly."""
    from pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 import main

    common = [
        "--tiny", "--resolution=16", "--batch_size=2", "--max_prompts=4",
        "--num_steps=4", "--scorers=pickscore,clip,aesthetic,imagereward,hps",
    ]
    resident = main(common + [f"--output_json={tmp_path / 'a.json'}"])
    offloaded = main(
        common + ["--offload_scorers", f"--output_json={tmp_path / 'b.json'}"]
    )
    assert set(resident) == {
        "pickscore_mean", "clip_mean", "aesthetic_mean",
        "imagereward_mean", "hps_mean",
    }
    for k, v in resident.items():
        np.testing.assert_allclose(offloaded[k], v, rtol=0, atol=0)


def test_evaluate_cli_score_chunk_matches_unchunked(tmp_path):
    """--score_chunk (stage each scorer once per N prompts, VERDICT r4 #4
    staging amortization) must be bit-identical to the per-batch path,
    including an uneven final chunk (6 prompts, chunk 4 -> chunks 4+2)."""
    import json as _json

    from pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 import main

    common = [
        "--tiny", "--resolution=16", "--batch_size=2", "--max_prompts=6",
        "--num_steps=4", "--scorers=pickscore,aesthetic", "--timing",
    ]
    base = main(common + [f"--output_json={tmp_path / 'a.json'}"])
    chunked = main(
        common
        + [
            "--offload_scorers", "--score_chunk=4",
            f"--output_json={tmp_path / 'b.json'}",
        ]
    )
    for k, v in base.items():
        np.testing.assert_allclose(chunked[k], v, rtol=0, atol=0)
    with open(tmp_path / "a.json") as f:
        a = _json.load(f)
    with open(tmp_path / "b.json") as f:
        b = _json.load(f)
    assert a["per_prompt"]["pickscore"] == b["per_prompt"]["pickscore"]
    # 6 prompts / chunk 4 -> two chunks; per-prompt accounting intact
    assert b["timing"]["score_chunk"] == 4
    assert len(b["per_prompt"]["prompts"]) == 6
    # prompts_per_min comes from the prompt-weighted steady-state sums
    assert b["timing"]["prompts_per_min"] > 0


def test_evaluate_cli_loads_scorer_weights(tmp_path):
    """The eval CLI must be able to score with REAL weight files (round-2
    verdict: it always ran random towers). Tiny HF CLIPModel + aesthetic
    .pth files are synthesized and must change the reported scores."""
    torch = pytest.importorskip("torch")
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    from pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 import main

    # tiny HF CLIPModel matching CLIPTextConfig.tiny/CLIPVisionConfig.tiny
    hf_cfg = HFCLIPConfig(
        text_config={
            "vocab_size": 1000, "hidden_size": 32, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "max_position_embeddings": 77, "hidden_act": "gelu",
            "eos_token_id": 2,
        },
        vision_config={
            "image_size": 28, "patch_size": 7, "hidden_size": 32,
            "intermediate_size": 128, "num_hidden_layers": 2,
            "num_attention_heads": 4, "hidden_act": "gelu",
        },
        projection_dim=16,
    )
    torch.manual_seed(11)
    hf = CLIPModel(hf_cfg).eval()
    clip_dir = tmp_path / "clip_model"
    clip_dir.mkdir()
    from safetensors.numpy import save_file

    save_file(
        {k: v.numpy() for k, v in hf.state_dict().items()},
        str(clip_dir / "model.safetensors"),
    )
    # tiny aesthetic MLP (input = tiny projection_dim 16)
    mlp = torch.nn.Module()
    mlp.layers = torch.nn.Sequential(
        torch.nn.Linear(16, 1024), torch.nn.Dropout(0.2),
        torch.nn.Linear(1024, 128), torch.nn.Dropout(0.2),
        torch.nn.Linear(128, 64), torch.nn.Dropout(0.1),
        torch.nn.Linear(64, 16), torch.nn.Linear(16, 1),
    )
    mlp_path = str(tmp_path / "aesthetic.pth")
    torch.save(mlp.state_dict(), mlp_path)

    common = [
        "--tiny", "--resolution=16", "--batch_size=2", "--max_prompts=2",
        "--scorers=pickscore,hps,aesthetic",
    ]
    base = main(common)
    loaded = main(
        common
        + [
            f"--pickscore_dir={clip_dir}",
            f"--hps_path={clip_dir / 'model.safetensors'}",
            f"--aesthetic_clip_dir={clip_dir}",
            f"--aesthetic_mlp_path={mlp_path}",
        ]
    )
    assert all(np.isfinite(v) for v in loaded.values())
    for k in ("pickscore_mean", "hps_mean", "aesthetic_mean"):
        assert loaded[k] != base[k], k
    # same weight files twice -> identical scores (deterministic port)
    again = main(
        common
        + [
            f"--pickscore_dir={clip_dir}",
            f"--hps_path={clip_dir / 'model.safetensors'}",
            f"--aesthetic_clip_dir={clip_dir}",
            f"--aesthetic_mlp_path={mlp_path}",
        ]
    )
    assert again == loaded


def test_online_runner_deterministic(tmp_path):
    """Same config + seed -> bit-identical training metrics."""
    from pairwise_sample_optimization_tpu.cli.online_runner import run_online_pso

    c1 = _tiny_online_config(tmp_path / "a", "turbo")
    c2 = _tiny_online_config(tmp_path / "b", "turbo")
    _, h1 = run_online_pso(c1, sampler="turbo", num_epochs=1)
    _, h2 = run_online_pso(c2, sampler="turbo", num_epochs=1)
    assert h1[0]["loss"] == h2[0]["loss"]
    assert h1[0]["grad_norm"] == h2[0]["grad_norm"]


def test_evaluate_cli_imagereward_tiny(tmp_path):
    from pairwise_sample_optimization_tpu.cli.evaluate_sdxl_dmd2 import main

    summary = main(
        [
            "--tiny",
            "--resolution=16",
            "--batch_size=2",
            "--max_prompts=2",
            "--scorers=imagereward",
        ]
    )
    assert set(summary) == {"imagereward_mean"}
    assert np.isfinite(summary["imagereward_mean"])


def test_generate_cli_tiny(tmp_path):
    from pairwise_sample_optimization_tpu.cli.generate import main

    paths = main(
        [
            "--tiny",
            "--resolution=16",
            "--prompt=a corgi on a beach",
            "--prompt=an oil painting of a lighthouse",
            "--num_steps=4",
            "--lora_rank=2",
            f"--out={tmp_path / 'gen'}",
        ]
    )
    assert len(paths) == 2
    assert all(os.path.exists(p) for p in paths)


def test_dreambooth_cli_tiny(tmp_path):
    from PIL import Image

    from pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth import (
        main,
    )

    d = tmp_path / "instance"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    state = main(
        [
            "--tiny",
            f"--instance_data_dir={d}",
            "--instance_prompt=a photo of sks dog",
            "--class_prompt=a photo of dog",
            "--resolution=16",
            "--train_batch_size=2",
            "--max_train_steps=2",
            "--num_negatives=3",
            "--rank=2",
            "--checkpointing_steps=2",
            f"--output_dir={tmp_path / 'out'}",
        ]
    )
    assert int(state.step) == 2
    assert os.path.exists(
        tmp_path / "out" / "lora-2" / "pytorch_lora_weights.safetensors"
    )


def test_dreambooth_cli_checkpointing_zero_disables(tmp_path):
    """--checkpointing_steps=0 disables periodic saves (no ZeroDivision;
    online-runner semantics) while the final-step export still lands."""
    from PIL import Image

    from pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth import (
        main,
    )

    d = tmp_path / "instance"
    d.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray(
        rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
    ).save(d / "0.png")

    state = main(
        [
            "--tiny",
            f"--instance_data_dir={d}",
            "--instance_prompt=a photo of sks dog",
            "--resolution=16",
            "--train_batch_size=1",
            "--max_train_steps=2",
            "--num_negatives=1",
            "--rank=2",
            "--checkpointing_steps=0",
            "--skip_validation",
            f"--output_dir={tmp_path / 'out'}",
        ]
    )
    assert int(state.step) == 2
    # no step-1 periodic save; only the final export
    assert not os.path.exists(tmp_path / "out" / "lora-1")
    assert os.path.exists(
        tmp_path / "out" / "lora-2" / "pytorch_lora_weights.safetensors"
    )


def test_dreambooth_cli_validation_te_lora_and_resume(tmp_path):
    """Full parity tail in one tiny run: grad accum, TE-LoRA training,
    the 25-prompt validation suite, and resume-from-checkpoint."""
    from PIL import Image

    from pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth import (
        main,
    )

    d = tmp_path / "instance"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    common = [
        "--tiny",
        f"--instance_data_dir={d}",
        "--instance_prompt=a photo of sks dog",
        "--class_prompt=a photo of dog",
        "--resolution=16",
        "--train_batch_size=1",
        "--gradient_accumulation_steps=2",
        "--train_text_encoder",
        "--num_negatives=2",
        "--rank=2",
        "--checkpointing_steps=2",
        "--validation_steps=2",
        "--num_validation_images=1",
        "--is_object",
        f"--output_dir={tmp_path / 'out'}",
    ]
    state = main(common + ["--max_train_steps=2"])
    assert int(state.step) == 2
    # joint LoRA export carries all three model prefixes
    from safetensors import safe_open

    with safe_open(
        str(tmp_path / "out" / "lora-2" / "pytorch_lora_weights.safetensors"),
        framework="numpy",
    ) as f:
        keys = list(f.keys())
    assert any(k.startswith("unet.") for k in keys)
    assert any(k.startswith("text_encoder.") for k in keys)
    assert any(k.startswith("text_encoder_2.") for k in keys)
    # validation suite: 25 prompt dirs x num_validation_images
    gen = tmp_path / "out" / "gen_2"
    subdirs = sorted(os.listdir(gen))
    assert subdirs == [f"p_{i:03d}" for i in range(1, 26)]
    assert sorted(os.listdir(gen / "p_001")) == ["img_01.png"]

    # resume continues from step 2 (not from scratch)
    state = main(
        common + ["--max_train_steps=3", "--resume_from_checkpoint=latest",
                  "--skip_validation"]
    )
    assert int(state.step) == 3


def test_dreambooth_cli_prodigy_dora_kohya_prior(tmp_path):
    """The optimizer/adapter option surface in one tiny run: prodigy,
    DoRA, lr scheduler, prior-preservation class pool (pregenerated),
    epochs->steps math, kohya export, checkpoint retention."""
    from PIL import Image

    from pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth import (
        main,
    )

    d = tmp_path / "instance"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")
    class_dir = tmp_path / "class"

    state = main(
        [
            "--tiny",
            f"--instance_data_dir={d}",
            "--instance_prompt=a photo of sks dog",
            "--class_prompt=a photo of dog",
            "--resolution=16",
            "--train_batch_size=2",
            "--gradient_accumulation_steps=1",
            # no --max_train_steps: 1 epoch x ceil(4 / (2*1)) = 2 steps
            "--num_train_epochs=1",
            "--optimizer=prodigy",
            "--learning_rate=1.0",
            "--lr_scheduler=cosine",
            "--lr_warmup_steps=1",
            "--use_dora",
            "--random_flip",
            "--with_prior_preservation",
            f"--class_data_dir={class_dir}",
            "--num_class_images=2",
            "--rank=2",
            "--checkpointing_steps=1",
            "--checkpoints_total_limit=1",
            "--output_kohya_format",
            "--skip_validation",
            f"--output_dir={tmp_path / 'out'}",
        ]
    )
    assert int(state.step) == 2
    # class pool pregenerated on disk
    assert len(os.listdir(class_dir)) == 2
    # kohya-format export exists with the kohya key layout + DoRA scales
    from safetensors import safe_open

    with safe_open(
        str(tmp_path / "out" / "lora-2" / "pytorch_lora_weights_kohya.safetensors"),
        framework="numpy",
    ) as f:
        keys = list(f.keys())
    assert any(k.startswith("lora_unet_") and k.endswith(".lora_down.weight")
               for k in keys)
    assert any(k.endswith(".alpha") for k in keys)
    assert any(k.endswith(".dora_scale") for k in keys)
    # retention pruned to the newest checkpoint
    from pairwise_sample_optimization_tpu.checkpoints import latest_checkpoint

    kept = [f for f in os.listdir(tmp_path / "out") if f.startswith("checkpoint")]
    assert len(kept) == 1
    assert latest_checkpoint(str(tmp_path / "out")).endswith("-2")


def test_dreambooth_prior_preservation_class_in_win_half(tmp_path, monkeypatch):
    """Prior preservation must append class images to the WINNER half with
    class-prompt conditioning (reference collate_fn :1015-1019) — losers
    stay the step-0 self-generated negatives. (Round-2 advisor finding:
    the old CLI used the class pool as losers, inverting preservation.)"""
    from PIL import Image

    from pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth import (
        main,
    )
    from pairwise_sample_optimization_tpu.train.dreambooth_pso import (
        DreamBoothPSOTrainer,
    )

    d = tmp_path / "instance"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")

    captured = {}
    orig_update = DreamBoothPSOTrainer.update

    def spy(self, state, params, batch, key):
        import jax

        captured.setdefault("batch", jax.tree.map(np.asarray, batch))
        return orig_update(self, state, params, batch, key)

    monkeypatch.setattr(DreamBoothPSOTrainer, "update", spy)
    main(
        [
            "--tiny",
            f"--instance_data_dir={d}",
            "--instance_prompt=a photo of sks dog",
            "--class_prompt=a photo of dog",
            "--resolution=16",
            "--train_batch_size=1",
            "--gradient_accumulation_steps=1",
            "--max_train_steps=1",
            "--num_negatives=3",
            "--with_prior_preservation",
            f"--class_data_dir={tmp_path / 'class'}",
            "--num_class_images=2",
            "--rank=2",
            "--checkpointing_steps=100",
            "--skip_validation",
            f"--output_dir={tmp_path / 'out'}",
        ]
    )
    batch = captured["batch"]
    # win half = [instance(1) | class(1)], losers mirror it (2 negatives)
    assert batch["instance_latents"].shape[0] == 2
    assert batch["negative_latents"].shape[0] == 2
    # class row is conditioned on the CLASS prompt (differs from instance)
    embeds = batch["cond"]["embeds"]
    assert not np.allclose(embeds[0], embeds[1])
    # the winner class latents are NOT drawn from the negatives pool
    # (negatives are generated with a different key stream)
    assert not np.allclose(
        batch["instance_latents"][1], batch["negative_latents"][1]
    )


def test_dreambooth_cli_8bit_adam_and_te_weight_decay(tmp_path):
    from PIL import Image

    from pairwise_sample_optimization_tpu.cli.train_pso_sdxl_turbo_dreambooth import (
        main,
    )

    d = tmp_path / "instance"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        ).save(d / f"{i}.png")
    state = main(
        [
            "--tiny",
            f"--instance_data_dir={d}",
            "--instance_prompt=a photo of sks dog",
            "--resolution=16",
            "--train_batch_size=1",
            "--gradient_accumulation_steps=1",
            "--max_train_steps=1",
            "--use_8bit_adam",
            "--train_text_encoder",
            "--adam_weight_decay_text_encoder=0.01",
            "--lr_scheduler=constant_with_warmup",
            "--lr_warmup_steps=2",
            "--num_negatives=2",
            "--rank=2",
            "--checkpointing_steps=5",
            "--skip_validation",
            f"--output_dir={tmp_path / 'out8'}",
        ]
    )
    assert int(state.step) == 1


def test_dreambooth_validation_prompts():
    from pairwise_sample_optimization_tpu.train.db_validation import (
        dreambooth_validation_prompts,
    )

    obj = dreambooth_validation_prompts("sks", "clock", True)
    live = dreambooth_validation_prompts("sks", "dog", False)
    assert len(obj) == len(live) == 25
    assert obj[0] == "a sks clock in the jungle"
    assert "a sks clock floating on top of water" in obj
    assert "a sks dog wearing a santa hat" in live
    assert obj[-1] == "a cube shaped sks clock"

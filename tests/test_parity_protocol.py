"""End-to-end smoke of scripts/parity_protocol.sh (VERDICT r4 #5).

The one-command real-weight parity runbook had never run as a script —
only the CLI underneath it. This test fabricates a TINY weights_root in
the exact layout the script documents (diffusers-layout sdxl/, released
LoRA file, HF CLIPModel dirs, aesthetic .pth, imagereward files,
prompts.json, BPE vocab) and runs the actual bash script in a CPU
subprocess, asserting it exits 0 and writes both parity_results.json and
PARITY_RESULTS.md. The day real weights appear, the same command works
with the tiny overrides dropped.
"""

import functools
import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "parity_protocol.sh")
BPE = os.path.join(
    REPO, "pairwise_sample_optimization_tpu", "data", "assets",
    "bpe_simple_vocab_16e6.txt.gz",
)


def _build_weights_root(root):
    """Tiny-real-layout weights_root: every file the script's doc block
    promises, generated at tiny shapes."""
    torch = pytest.importorskip("torch")
    from safetensors.numpy import save_file
    from transformers import CLIPConfig as HFCLIPConfig
    from transformers import CLIPModel

    from pairwise_sample_optimization_tpu.checkpoints import (
        export_lora_safetensors,
        flax_to_torch,
    )
    from pairwise_sample_optimization_tpu.checkpoints.torch_names import (
        clip_text_param_map,
        unet_param_map,
        vae_param_map,
    )
    from pairwise_sample_optimization_tpu.pipeline import SDXLPipeline

    # --- sdxl/: tiny diffusers-layout checkpoint dir -------------------
    src = SDXLPipeline.random(
        tiny=True, resolution=16, lora_rank=2, key=jax.random.key(7)
    )
    n_unet = len(src.unet_config.block_out_channels)
    n_vae = len(src.vae.config.block_out_channels)
    exports = [
        ("unet", src.unet_variables["params"],
         functools.partial(unet_param_map, n_levels=n_unet)),
        ("vae", src.vae_variables["params"],
         functools.partial(vae_param_map, n_levels=n_vae)),
        ("text_encoder", src.te1_variables["params"], clip_text_param_map),
        ("text_encoder_2", src.te2_variables["params"], clip_text_param_map),
    ]
    for sub, params, nm in exports:
        d = root / "sdxl" / sub
        d.mkdir(parents=True)
        sd = {
            k: np.asarray(v, np.float32)
            for k, v in flax_to_torch(params, nm).items()
        }
        save_file(sd, str(d / "model.safetensors"))

    # --- lora/: released-layout LoRA file -------------------------------
    (root / "lora").mkdir()
    export_lora_safetensors(
        src.unet_variables["lora"],
        str(root / "lora" / "pytorch_lora_weights.safetensors"),
    )

    # --- pickscore/ clip/ aesthetic_clip/: tiny HF CLIPModel dirs ------
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
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    for sub in ("pickscore", "clip", "aesthetic_clip"):
        d = root / sub
        d.mkdir()
        save_file(sd, str(d / "model.safetensors"))

    # --- aesthetic MLP at the tiny projection_dim ------------------------
    mlp = torch.nn.Module()
    mlp.layers = torch.nn.Sequential(
        torch.nn.Linear(16, 1024), torch.nn.Dropout(0.2),
        torch.nn.Linear(1024, 128), torch.nn.Dropout(0.2),
        torch.nn.Linear(128, 64), torch.nn.Dropout(0.1),
        torch.nn.Linear(64, 16), torch.nn.Linear(16, 1),
    )
    torch.save(mlp.state_dict(), str(root / "aesthetic.pth"))

    # --- imagereward/: file slots (the CLI's --tiny branch builds toy
    # towers and ignores the weights; the files exercise flag plumbing) --
    ir = root / "imagereward"
    ir.mkdir()
    torch.save({}, str(ir / "ImageReward-v1.0.pt"))
    (ir / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
                  + [chr(c) for c in range(ord("a"), ord("z") + 1)])
    )

    # --- protocol prompts + BPE vocab -----------------------------------
    (root / "prompts.json").write_text(
        json.dumps(["a photo of a corgi", "an astronaut riding a horse",
                    "a red cube on a blue sphere", "a watercolor fox"])
    )
    (root / "bpe").mkdir()
    (root / "bpe" / "bpe_simple_vocab_16e6.txt.gz").write_bytes(
        open(BPE, "rb").read()
    )


@pytest.mark.timeout(900)
def test_parity_protocol_script_end_to_end(tmp_path):
    _build_weights_root(tmp_path)

    out_json = tmp_path / "parity_results.json"
    out_md = tmp_path / "PARITY_RESULTS.md"
    env = {
        **os.environ,
        # CPU subprocess: drop the axon sitecustomize (it pins the TPU
        # platform at interpreter startup, before env vars can act)
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PSO_PARITY_JSON": str(out_json),
        "PSO_PARITY_MD": str(out_md),
    }
    env.pop("PSO_TEST_TPU", None)
    # positionals: weights_root, max_prompts; the rest are tiny-shape
    # overrides appended after the script's own flags (argparse last-wins)
    cmd = [
        "bash", SCRIPT, str(tmp_path), "2",
        "--tiny", "--resolution", "16", "--batch_size", "2",
        "--lora_rank", "2",
        "--aesthetic_mlp_path", str(tmp_path / "aesthetic.pth"),
        # tiny towers have a 1000-id vocab: the real 49408-id BPE would
        # drive the embedding take out of bounds (NaN fill) — fall back
        # to the HashTokenizer like every other tiny smoke
        "--bpe_path", "",
    ]
    r = subprocess.run(
        cmd, env=env, cwd=str(tmp_path), capture_output=True, text=True,
        timeout=840,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"

    res = json.loads(out_json.read_text())
    assert res["n_prompts"] == 2
    for k in ("pickscore_mean", "clip_mean", "aesthetic_mean",
              "imagereward_mean"):
        assert np.isfinite(res[k]), (k, res)

    md = out_md.read_text()
    assert "pickscore" in md and "imagereward" in md
    # the LoRA file must actually have been loaded (CLI logs it)
    assert "loaded PSO LoRA" in (r.stdout + r.stderr), r.stderr[-2000:]

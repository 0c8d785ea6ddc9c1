"""Config-knob audit: every live-looking knob must be consumed somewhere.

The reference carries knobs its trainers parse but never consume
(``config_sdxl_turbo_dpo.py:135-156``); we keep those for drop-in
override compatibility — but ONLY those, explicitly listed. Any other
config field must be read by non-config source, so a future knob cannot
silently rot (the r1 ``train.distilled_train_steps`` failure mode).
"""

import os
import re

import pytest

PKG = os.path.join(os.path.dirname(__file__), "..", "pairwise_sample_optimization_tpu")

# knobs deliberately inert, with the reason
PARITY_INERT = {
    # reference schema parity: its own trainers parse-but-ignore these
    "sample.eval_batch_size",
    "sample.eval_epoch",
    "sample.save_interval",
    "train.timestep_fraction",
    "train.adv_clip_max",
    "train.clip_range",
    "train.save_interval",
    "kl_ratio",
    # also reference-inert: logdir is defined but never read
    # (config_sdxl_turbo_dpo.py:13); eta/guidance_scale are DDPO-era knobs
    # the PSO trainers hardcode away (guidance_scale=0. at
    # train_online_pso_sdxl_turbo.py:583,603; eta never referenced — our
    # DDIM/SD1.5 samplers take eta/guidance as call args instead)
    "logdir",
    "sample.eta",
    "sample.guidance_scale",
    # DDPO heritage carried by the reference config, unused in its PSO loss
    "per_prompt_stat_tracking.buffer_size",
    "per_prompt_stat_tracking.min_count",
    # legacy prompt-closure registry (reference prompts.py, unused by its
    # current trainers; the registry itself is implemented + tested)
    "prompt_fn",
    # reference-inert: config.reward_fn selects from the closure registry
    # but the reference's own online trainers instantiate their Selectors
    # directly (train_online_pso_sdxl_turbo.py:455-458) — as does the
    # runner (PickScore hardwired); the registry is implemented + tested
    "reward_fn",
}


def _flatten(cfg, prefix=""):
    out = {}
    for k, v in cfg.items():
        path = f"{prefix}{k}"
        if hasattr(v, "items"):
            out.update(_flatten(v, path + "."))
        else:
            out[path] = v
    return out


def _source_blob():
    chunks = []
    for root, _dirs, files in os.walk(PKG):
        if os.path.basename(root) == "configs":
            continue
        for f in files:
            if f.endswith(".py"):
                with open(os.path.join(root, f)) as fh:
                    chunks.append(fh.read())
    # bench + graft entry are consumers too
    for extra in ("bench.py", "__graft_entry__.py"):
        p = os.path.join(os.path.dirname(__file__), "..", extra)
        if os.path.exists(p):
            with open(p) as fh:
                chunks.append(fh.read())
    return "\n".join(chunks)


@pytest.mark.parametrize("name", ["sdxl_turbo_dpo", "sdxl_dmd_dpo"])
def test_every_config_knob_is_consumed(name):
    import importlib

    mod = importlib.import_module(
        f"pairwise_sample_optimization_tpu.configs.{name}"
    )
    cfg = mod.get_config()
    blob = _source_blob()
    dead = []
    for path in _flatten(cfg):
        if path in PARITY_INERT:
            continue
        leaf = path.split(".")[-1]
        # consumed as attribute access, .get("..."), or ["..."] lookup
        pat = re.compile(
            rf"(\.{re.escape(leaf)}\b|\[[\"']{re.escape(leaf)}[\"']\]|"
            rf"\.get\([\"']{re.escape(leaf)}[\"'])"
        )
        if not pat.search(blob):
            dead.append(path)
    assert not dead, f"config knobs never consumed by any source: {dead}"


def test_parity_inert_knobs_still_exist():
    """The inert list must track the config (no stale audit entries)."""
    import importlib

    for name in ("sdxl_turbo_dpo", "sdxl_dmd_dpo"):
        mod = importlib.import_module(
            f"pairwise_sample_optimization_tpu.configs.{name}"
        )
        flat = _flatten(mod.get_config())
        for knob in PARITY_INERT:
            assert knob in flat, f"{knob} in audit list but not in {name} config"

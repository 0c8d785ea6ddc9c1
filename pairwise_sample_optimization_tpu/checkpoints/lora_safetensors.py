"""Diffusers-layout LoRA safetensors interop.

The reference ecosystem exchanges LoRA as ``pytorch_lora_weights.safetensors``
with keys ``unet.<module>.lora.down.weight`` / ``.lora.up.weight``
(diffusers conversion of peft's lora_A/lora_B; written by
``StableDiffusionXLLoraLoaderMixin.save_lora_weights``, reference
``train_online_pso_sdxl_turbo.py:379``; read back at ``:138`` and
``evaluate_sdxl_dmd2.py:194`` — including the released ``ZichenMiao/PSO``
adapters). This module round-trips that format against this framework's
'lora' collection (leaves ``a`` (in,r) = down^T, ``b`` (r,out) = up^T).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .torch_names import clip_text_param_map, unet_param_map

_PEFT_SUFFIX = {
    "a": "lora.down.weight",
    "b": "lora.up.weight",
    # DoRA per-column magnitude (peft lora_magnitude_vector); 1-D so the
    # export transpose is a no-op
    "magnitude": "lora_magnitude_vector",
}
_PEFT_ALT = {  # raw peft layout
    "a": "lora_A.weight",
    "b": "lora_B.weight",
    "magnitude": "lora_magnitude_vector.weight",
}


def _site_key(path: Tuple[str, ...], n_levels: int, site_map=None) -> str:
    """flax lora module path (without a/b leaf) -> diffusers module key."""
    # reuse the param map by asking for the would-be kernel of this site
    if site_map is None:
        key, _ = unet_param_map(path + ("kernel",), n_levels)
    else:
        key, _ = site_map(path + ("kernel",))
    return key[: -len(".weight")]


def export_lora_safetensors(
    lora_tree,
    path: str | None = None,
    n_levels: int = 3,
    prefix: str = "unet.",
    site_map=None,
) -> Dict[str, np.ndarray]:
    """'lora' collection -> diffusers-layout dict (optionally written).

    ``site_map`` overrides the module-path naming (default: UNet); pass
    ``clip_text_param_map`` with ``prefix='text_encoder.'`` for TE LoRA.
    """
    out: Dict[str, np.ndarray] = {}

    def emit(p, leaf):
        names = tuple(x.key for x in p)
        site, ab = names[:-1], names[-1]
        key = prefix + _site_key(site, n_levels, site_map) + "." + _PEFT_SUFFIX[ab]
        if (
            hasattr(leaf, "is_fully_addressable")
            and not leaf.is_fully_addressable
        ):
            # multi-host REPLICATED leaf: every host holds a full copy —
            # read the local shard (np.asarray would raise)
            leaf = leaf.addressable_data(0)
        # contiguous copy: safetensors writes raw buffers, not strided views
        out[key] = np.ascontiguousarray(
            np.asarray(leaf, np.float32).T  # (in,r)->(r,in), (r,out)->(out,r)
        )
        return leaf

    jax.tree_util.tree_map_with_path(emit, lora_tree)
    if path is not None:
        from safetensors.numpy import save_file

        save_file(out, path)
    return out


def export_sdxl_lora_safetensors(
    lora_trees: Dict[str, object], path: str | None = None, n_levels: int = 3
) -> Dict[str, np.ndarray]:
    """Joint {'unet': ..., 'te1': ..., 'te2': ...} LoRA trees -> ONE
    diffusers-layout file (``StableDiffusionXLLoraLoaderMixin``
    convention: ``unet.``/``text_encoder.``/``text_encoder_2.`` prefixes,
    reference ``train_pso_sdxl_turbo_dreambooth.py:1374-1380``).
    Missing keys are simply omitted (UNet-only export == the plain path).
    """
    spec = {
        "unet": ("unet.", None),
        "te1": ("text_encoder.", clip_text_param_map),
        "te2": ("text_encoder_2.", clip_text_param_map),
    }
    out: Dict[str, np.ndarray] = {}
    for name, (prefix, site_map) in spec.items():
        if name in lora_trees and lora_trees[name] is not None:
            out.update(
                export_lora_safetensors(
                    lora_trees[name], None, n_levels, prefix, site_map
                )
            )
    if path is not None:
        from safetensors.numpy import save_file

        save_file(out, path)
    return out


def export_kohya_lora_safetensors(
    lora_trees: Dict[str, object], path: str | None = None, n_levels: int = 3
) -> Dict[str, np.ndarray]:
    """Joint LoRA trees -> kohya-ss layout (``--output_kohya_format``,
    reference ``train_pso_sdxl_turbo_dreambooth.py:735,2060-2075``):
    ``lora_unet_<module with _>_<site>.lora_down.weight`` / ``.lora_up.weight``
    / ``.alpha`` (alpha == rank, the reference's peft convention), with
    ``lora_te1_``/``lora_te2_`` prefixes for the text encoders and
    ``.dora_scale`` for DoRA magnitudes."""
    diff = export_sdxl_lora_safetensors(lora_trees, None, n_levels)
    prefix_map = {
        "unet.": "lora_unet_",
        "text_encoder.": "lora_te1_",
        "text_encoder_2.": "lora_te2_",
    }
    out: Dict[str, np.ndarray] = {}
    for k, v in diff.items():
        for dpfx, kpfx in prefix_map.items():
            if k.startswith(dpfx):
                rest = k[len(dpfx):]
                break
        else:
            raise KeyError(k)
        for dsuf, ksuf in (
            (".lora.down.weight", ".lora_down.weight"),
            (".lora.up.weight", ".lora_up.weight"),
            (".lora_magnitude_vector", ".dora_scale"),
        ):
            if rest.endswith(dsuf):
                site = rest[: -len(dsuf)]
                key = kpfx + site.replace(".", "_") + ksuf
                out[key] = v
                if ksuf == ".lora_down.weight":
                    out[kpfx + site.replace(".", "_") + ".alpha"] = np.asarray(
                        float(v.shape[0]), np.float32
                    )
                break
        else:
            raise KeyError(k)
    if path is not None:
        from safetensors.numpy import save_file

        save_file(out, path)
    return out


def import_lora_safetensors(
    source, abstract_lora, n_levels: int = 3, prefix: str = "unet.", site_map=None
):
    """diffusers-layout file/dict -> 'lora' collection tree.

    Accepts both ``lora.down/up.weight`` (diffusers) and
    ``lora_A/lora_B.weight`` (raw peft) key styles.
    """
    if isinstance(source, str):
        from safetensors import safe_open

        sd = {}
        with safe_open(source, framework="numpy") as f:
            for k in f.keys():
                sd[k] = f.get_tensor(k)
    else:
        sd = dict(source)

    def fill(p, leaf):
        names = tuple(x.key for x in p)
        site, ab = names[:-1], names[-1]
        base = prefix + _site_key(site, n_levels, site_map)
        for suffix_map in (_PEFT_SUFFIX, _PEFT_ALT):
            key = base + "." + suffix_map[ab]
            if key in sd:
                arr = np.asarray(sd[key]).T
                if tuple(arr.shape) != tuple(leaf.shape):
                    raise ValueError(
                        f"lora shape mismatch at {key}: {arr.shape} vs {leaf.shape}"
                    )
                return jnp.asarray(arr, leaf.dtype)
        raise KeyError(f"no lora tensor for {base} ({ab})")

    return jax.tree_util.tree_map_with_path(fill, abstract_lora)

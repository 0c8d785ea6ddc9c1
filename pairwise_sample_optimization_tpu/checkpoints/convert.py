"""One-time torch -> flax weight porting (and the reverse for export).

Loads a diffusers/HF state dict from .safetensors or .bin (torch-CPU) and
fills a flax params tree using the name maps in ``torch_names``. Verifies
completeness: every flax leaf must find its torch tensor with matching
(transformed) shape; unused torch keys are reported.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .safetensors or torch .bin/.pt file into numpy arrays.

    Accepts a directory (an HF snapshot dir): picks ``model.safetensors``
    / ``pytorch_model.bin`` if present, else the first weight file."""
    import os

    if os.path.isdir(path):
        names = sorted(os.listdir(path))
        for preferred in ("model.safetensors", "pytorch_model.bin"):
            if preferred in names:
                path = os.path.join(path, preferred)
                break
        else:
            cands = [
                n for n in names if n.endswith((".safetensors", ".bin", ".pt"))
            ]
            if not cands:
                raise FileNotFoundError(f"no weight files in {path}")
            path = os.path.join(path, cands[0])
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        try:
            with safe_open(path, framework="numpy") as f:
                for k in f.keys():
                    out[k] = f.get_tensor(k)
        except (TypeError, ValueError):
            # the numpy framework cannot represent bfloat16 tensors; some
            # SDXL-family releases ship bf16 safetensors — route through
            # torch (cpu) and upcast, mirroring the .pt branch below
            import torch

            out = {}
            with safe_open(path, framework="pt") as f:
                for k in f.keys():
                    v = f.get_tensor(k)
                    out[k] = (
                        v.float().numpy()
                        if v.dtype == torch.bfloat16
                        else v.numpy()
                    )
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in sd.items()}


def _to_flax(arr: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear":
        return np.asarray(arr).T
    if kind == "conv":
        return np.transpose(np.asarray(arr), (2, 3, 1, 0))
    if kind == "squeeze":
        # leading singleton axes dropped (timm ``cls_token`` (1,1,W) ->
        # (W,), ``pos_embed`` (1,S,W) -> (S,W))
        return np.squeeze(np.asarray(arr))
    return np.asarray(arr)


def _to_torch(arr: np.ndarray, kind: str) -> np.ndarray:
    # contiguous copies: safetensors serializes raw buffers, not strided views
    if kind == "linear":
        return np.ascontiguousarray(np.asarray(arr).T)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(np.asarray(arr), (3, 2, 0, 1)))
    if kind == "squeeze":
        raise NotImplementedError(
            "squeeze-kind leaves are import-only (scorer backbones are "
            "never exported back to torch)"
        )
    return np.ascontiguousarray(np.asarray(arr))


def _resolve_kind(kind: str, flax_leaf) -> str:
    if kind != "?":
        return kind
    return "conv" if np.ndim(flax_leaf) == 4 else "linear"


def torch_to_flax(
    torch_sd: Dict[str, np.ndarray],
    abstract_params,
    name_map: Callable[[Tuple[str, ...]], Tuple[str, str]],
    prefix: str = "",
    dtype=None,
    strict: bool = True,
):
    """Fill ``abstract_params``-shaped tree from a torch state dict.

    Args:
      abstract_params: pytree of arrays or ShapeDtypeStructs (eval_shape).
      name_map: one of ``torch_names.*_param_map`` (partial'd as needed).
      prefix: torch-key prefix to prepend (e.g. ``""`` for a bare UNet
        file, ``"text_model."`` handled inside maps already).
    Returns (params, unused_torch_keys).
    """
    used = set()

    def fill(path, leaf):
        names = tuple(p.key for p in path)
        key, kind = name_map(names)
        key = prefix + key
        if key not in torch_sd:
            if strict:
                raise KeyError(f"torch key {key} (for flax {'/'.join(names)}) missing")
            return jnp.zeros(leaf.shape, leaf.dtype)
        kind = _resolve_kind(kind, leaf)
        arr = _to_flax(torch_sd[key], kind)
        if tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"shape mismatch for {key}: torch->{arr.shape} vs flax {leaf.shape}"
            )
        used.add(key)
        return jnp.asarray(arr, dtype or leaf.dtype)

    params = jax.tree_util.tree_map_with_path(fill, abstract_params)
    unused = sorted(set(torch_sd) - used)
    return params, unused


def flax_to_torch(
    params,
    name_map: Callable[[Tuple[str, ...]], Tuple[str, str]],
    prefix: str = "",
) -> Dict[str, np.ndarray]:
    """Export a flax params tree to a diffusers/HF-layout state dict."""
    out: Dict[str, np.ndarray] = {}

    def emit(path, leaf):
        names = tuple(p.key for p in path)
        key, kind = name_map(names)
        kind = _resolve_kind(kind, leaf)
        out[prefix + key] = _to_torch(np.asarray(leaf), kind)
        return leaf

    jax.tree_util.tree_map_with_path(emit, params)
    return out


def reinit_lora_a(lora, key):
    """Re-randomize LoRA ``a`` leaves (normal, std 1/r — LoRADense's
    init) after a zeros fast-init: a == 0 AND b == 0 is a PERMANENTLY
    dead adapter (both gradients vanish: dL/da ~ b and dL/db ~ a)."""
    counter = [0]

    def f(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else None
        if name == "a" and getattr(leaf, "ndim", 0) == 2:
            r = leaf.shape[-1]
            counter[0] += 1
            k = jax.random.fold_in(key, counter[0])
            return (jax.random.normal(k, leaf.shape, jnp.float32) / r).astype(
                leaf.dtype
            )
        return leaf

    return jax.tree_util.tree_map_with_path(f, lora)


def refresh_dora_magnitudes(params, lora):
    """Recompute every DoRA ``magnitude`` leaf from its (freshly ported)
    kernel's column norms.

    ``LoRADense`` initializes ``magnitude = ||W||_col`` at init() time —
    from the RANDOM kernel. After a weight port swaps ``params`` the
    stale magnitudes would rescale every adapted projection by
    ``||W_random||/||W_loaded||`` (peft's DoRA initializes magnitude from
    the PRETRAINED weight, so the adapter must be a no-op at step 0).
    """

    def walk(lora_node, params_node):
        if not isinstance(lora_node, dict):
            return lora_node
        out = {}
        for k, v in lora_node.items():
            if k == "magnitude":
                kernel = params_node["kernel"]
                out[k] = jnp.linalg.norm(
                    jnp.asarray(kernel, jnp.float32), axis=0
                ).astype(v.dtype)
            else:
                out[k] = walk(v, params_node.get(k, {}) if isinstance(params_node, dict) else {})
        return out

    return walk(lora, params)

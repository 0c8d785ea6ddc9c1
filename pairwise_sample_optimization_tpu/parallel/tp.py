"""Tensor-parallel sharding specs for the UNet over the ``model`` axis.

The reference never shards the model (DDP replicates the 2.6B UNet per
GPU); the mesh here keeps a ``model`` axis for width sharding as a
capability beyond parity. The scaling-book recipe: annotate parameter
shardings (attention qkv column-wise, output projections row-wise, GEGLU
feed-forward likewise) and let GSPMD propagate activations and insert
the ICI collectives.

Use with jit auto-sharding: place params via ``shard_unet_params`` and
pass data-sharded batches; no model code changes are needed.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

_COL_KERNELS = ("to_q", "to_k", "to_v")  # output-dim sharded
_ROW_KERNELS = ("to_out",)  # input-dim sharded


def _path_names(path) -> list[str]:
    """Key names along a tree path, across key kinds (dict keys in the
    weight trees; attribute/index keys through NamedTuple train states
    and optax tuples)."""
    out = []
    for p in path:
        name = getattr(p, "key", None)
        if name is None:
            name = getattr(p, "name", None)
        if name is None:
            name = getattr(p, "idx", p)
        out.append(str(name))
    return out


def _spec_for(path) -> P:
    names = _path_names(path)
    leaf = names[-1]
    parent = names[-2] if len(names) > 1 else ""
    if parent in _COL_KERNELS:
        return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
    if parent in _ROW_KERNELS:
        return P(MODEL_AXIS, None) if leaf == "kernel" else P()
    # GEGLU feed-forward: proj_in column-wise, proj_out row-wise (``ff``
    # itself has no direct leaves; its children are matched one level up)
    if len(names) > 2 and names[-3] == "ff":
        if parent == "proj_in":
            return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
        if parent == "proj_out":
            return P(MODEL_AXIS, None) if leaf == "kernel" else P()
    return P()


def _lora_spec_for(path) -> P:
    names = _path_names(path)
    site = names[-2] if len(names) > 1 else ""
    ab = names[-1]
    if site in _COL_KERNELS:
        # a (in, r) replicated; b (r, out) column-sharded
        return P(None, MODEL_AXIS) if ab == "b" else P()
    if site in _ROW_KERNELS:
        # a (in, r) row-sharded; b replicated
        return P(MODEL_AXIS, None) if ab == "a" else P()
    return P()


def unet_param_shardings(variables, mesh: Mesh):
    """NamedSharding tree matching a UNet ``variables`` dict
    ({'params': ..., 'lora'?: ...})."""

    def for_collection(tree, spec_fn):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(mesh, spec_fn(path)), tree
        )

    out = {"params": for_collection(variables["params"], _spec_for)}
    if "lora" in variables:
        out["lora"] = for_collection(variables["lora"], _lora_spec_for)
    return out


def shard_unet_params(variables, mesh: Mesh):
    """Place UNet variables with tensor-parallel shardings."""
    shardings = unet_param_shardings(variables, mesh)
    return jax.tree.map(jax.device_put, variables, shardings)


def tp_state_shardings(state, mesh: Mesh, full_finetune: bool = False):
    """NamedSharding pytree for a PSOTrainState under tensor parallelism.

    The optimizer moments mirror the trainable tree, so the same
    site-name rules apply down every path (the path *suffix* through
    ``opt_state[...].mu``/``nu`` is the trainable tree's own path);
    scalars (``step``, adam ``count``) land on no-match ``P()``.
    LoRA mode uses the LoRA a/b rules; full-finetune states carry the
    whole param tree and use the kernel rules.
    """
    spec_fn = _spec_for if full_finetune else _lora_spec_for
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_fn(path)), state
    )


def shard_state_tp(state, mesh: Mesh, full_finetune: bool = False):
    """Place a PSOTrainState with tensor-parallel shardings."""
    return jax.tree.map(
        jax.device_put, state, tp_state_shardings(state, mesh, full_finetune)
    )

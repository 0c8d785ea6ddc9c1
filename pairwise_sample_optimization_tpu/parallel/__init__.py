from .mesh import MeshSpec, make_mesh, data_sharding, replicated_sharding
from .prng import host_fold, per_device_keys, split_for_steps
from .collectives import pmean_tree, all_gather_batch, padded_gather
from .fsdp import fsdp_param_shardings, shard_params_fsdp

__all__ = [
    "MeshSpec",
    "make_mesh",
    "data_sharding",
    "replicated_sharding",
    "host_fold",
    "per_device_keys",
    "split_for_steps",
    "pmean_tree",
    "all_gather_batch",
    "padded_gather",
    "fsdp_param_shardings",
    "shard_params_fsdp",
]

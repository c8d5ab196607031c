from aiic_tpu.parallel.mesh import create_mesh, mesh_shape_for
from aiic_tpu.parallel.sharding import (
    param_pspecs,
    lora_pspecs,
    shard_params,
    shard_train_step,
    make_sharded_classify_fn,
)

__all__ = [
    "create_mesh",
    "mesh_shape_for",
    "param_pspecs",
    "lora_pspecs",
    "shard_params",
    "shard_train_step",
    "make_sharded_classify_fn",
]

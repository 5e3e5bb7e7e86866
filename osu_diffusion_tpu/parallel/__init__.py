from osu_diffusion_tpu.parallel.mesh import make_mesh
from osu_diffusion_tpu.parallel.sharding import (
    batch_sharding,
    param_partition_spec,
    shard_params,
)
from osu_diffusion_tpu.parallel.train_step import TrainState, make_train_step

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_partition_spec",
    "shard_params",
    "TrainState",
    "make_train_step",
]

from .mesh import (P, batch_sharding, dau_param_spec, make_mesh,
                   param_shardings, spatial_sharding)
from .train import TrainState, init_sharded, make_train_step

__all__ = [
    "P",
    "batch_sharding",
    "dau_param_spec",
    "make_mesh",
    "param_shardings",
    "spatial_sharding",
    "TrainState",
    "init_sharded",
    "make_train_step",
]

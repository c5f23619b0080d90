from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    mesh_from_config,
    param_partition_spec,
    param_shardings,
    replicated,
    shard_tree_like,
)
from .collectives import (
    gather_features,
    host_allgather,
    psum_mean,
    reduce_mean_metrics,
)
from .pipeline import (
    PIPE_AXIS,
    pipeline_apply,
    stage_params,
    unstage_params,
)
from .train_step import make_sharded_eval_step, make_sharded_train_step

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "pipeline_apply",
    "stage_params",
    "unstage_params",
    "batch_sharding",
    "gather_features",
    "host_allgather",
    "make_mesh",
    "make_sharded_eval_step",
    "make_sharded_train_step",
    "mesh_from_config",
    "param_partition_spec",
    "param_shardings",
    "psum_mean",
    "reduce_mean_metrics",
    "replicated",
    "shard_tree_like",
]

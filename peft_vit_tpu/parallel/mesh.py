"""Device mesh + sharding rules.

The reference's only parallelism is DDP over NCCL (SURVEY §2.4:
tools/train.py:119-123, utils/comm.py).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis; XLA/GSPMD inserts the
all-reduces over ICI that DDP did explicitly.  A ``model`` axis is wired
through (free with GSPMD) for tensor-parallel sharding of the MLP/attention
matmuls — not needed for ViT-B (params replicate) but available for larger
towers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def make_mesh(
    data: int = -1,
    model: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """data=-1 uses all remaining devices.  pipe > 1 appends a third
    ``pipe`` axis (pipeline parallelism, parallel/pipeline.py); the
    default 2-axis (data, model) mesh is unchanged otherwise."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % (model * pipe) == 0, (n, model, pipe)
        data = n // (model * pipe)
    assert data * model * pipe == n, (data, model, pipe, n)
    if pipe > 1:
        arr = np.asarray(devices).reshape(data, model, pipe)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def mesh_from_config(cfg, devices=None) -> Mesh:
    return make_mesh(
        data=int(cfg.TPU.MESH.DATA),
        model=int(cfg.TPU.MESH.MODEL),
        pipe=int(cfg.TPU.MESH.get("PIPE", 1)),
        devices=devices,
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_partition_spec(path: str, shape: tuple) -> P:
    """Tensor-parallel rules for a 'model' mesh axis.

    Megatron-style: column-parallel first matmul, row-parallel second —
    the pattern for both the MLP (c_fc/c_proj) and attention
    (in_proj/out_proj).  Everything else replicates.  With model=1 these
    all collapse to full replication.
    """
    if len(shape) != 2:
        return P()
    if "mlp/c_fc/kernel" in path or "attn/in_proj/kernel" in path:
        return P(None, MODEL_AXIS)
    if "mlp/c_proj/kernel" in path or "attn/out_proj/kernel" in path:
        return P(MODEL_AXIS, None)
    return P()


def param_shardings(mesh: Mesh, params: Any):
    """NamedSharding pytree for a param tree under `mesh`.

    None leaves (the holes left by peft.split_params) map to None.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    out = {
        k: (
            None
            if v is None
            else NamedSharding(mesh, param_partition_spec(k, v.shape))
        )
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(out, sep="/")


def zero_param_shardings(mesh: Mesh, params: Any):
    """ZeRO-1-style shardings for optimizer state: partition each leaf's
    largest divisible dim over the DATA axis (replicate tiny leaves).

    With these on the momentum buffers, GSPMD turns the gradient
    all-reduce into reduce-scatter + (post-update) all-gather — the ZeRO
    communication pattern — cutting optimizer-state memory per chip by
    the data-parallel degree.  The reference exposed (but never used) a
    ZeRO flag; here it falls out of sharding annotations.
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params, sep="/")
    out = {k: _zero_leaf_sharding(mesh, v) for k, v in flat.items()}
    return traverse_util.unflatten_dict(out, sep="/")


def _zero_leaf_sharding(mesh: Mesh, v) -> Optional[NamedSharding]:
    """Partition a leaf's largest DATA-divisible dim; replicate otherwise."""
    if v is None:
        return None
    ndata = mesh.shape[DATA_AXIS]
    dims = list(np.shape(v))
    best = -1
    for i, d in enumerate(dims):
        if d % ndata == 0 and d >= ndata and (best < 0 or d > dims[best]):
            best = i
    if best < 0:
        return NamedSharding(mesh, P())
    spec = [None] * len(dims)
    spec[best] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def zero_tree_shardings(mesh: Mesh, tree: Any):
    """ZeRO-1 shardings for an arbitrary pytree (e.g. an optax state with
    NamedTuple nodes): shape-based per leaf, same rule as
    ``zero_param_shardings`` but without requiring a dict pytree."""
    return jax.tree_util.tree_map(
        lambda v: _zero_leaf_sharding(mesh, v), tree
    )


def shard_tree_like(tree, shardings):
    """Device-put a host pytree with the given shardings (None-aware)."""
    return jax.tree_util.tree_map(
        lambda x, s: x if x is None else jax.device_put(x, s),
        tree,
        shardings,
        is_leaf=lambda x: x is None,
    )

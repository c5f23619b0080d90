"""Cross-device collectives.

Replaces the reference's comm layer (utils/comm.py:12-154):

* ``reduce_mean_metrics``    <- _meter_reduce all_reduce
  (lib/core/function.py:271-279)
* ``gather_features``        <- grad-preserving gather_tensors
  (utils/comm.py:138-154, consumed by the CLIP contrastive loss at
  clip_openai.py:551-552)
* host-side object gather    <- pickled-byte-tensor all_gather
  (utils/comm.py:67-106); here jax.experimental.multihost_utils

Inside ``shard_map``/pjit these lower to XLA collectives over ICI.
"""

from __future__ import annotations

import jax

from .mesh import DATA_AXIS


def psum_mean(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    return jax.lax.pmean(x, axis_name)


def reduce_mean_metrics(metrics: dict, axis_name: str = DATA_AXIS) -> dict:
    return {k: jax.lax.pmean(v, axis_name) for k, v in metrics.items()}


def gather_features(
    feats: jax.Array, axis_name: str = DATA_AXIS
) -> jax.Array:
    """All-gather feature rows across the data axis, keeping gradients
    flowing to the local shard (the defining property of the reference's
    gather_tensors).  jax.lax.all_gather is differentiable: the backward
    is a psum_scatter that routes each shard's gradient home."""
    return jax.lax.all_gather(feats, axis_name, axis=0, tiled=True)


def host_allgather(x):
    """Host-side object gather across processes (multi-host analog of the
    reference's pickled all_gather)."""
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x)


def allgather_ragged(x):
    """Gather per-process arrays that may differ in leading length (e.g.
    each process's shard of the eval set) into one concatenated array, in
    process order.  Pads to the max length for the fixed-shape collective,
    then trims — the multi-host analog of the reference's padded
    byte-tensor all_gather (utils/comm.py:67-106)."""
    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_count() <= 1:
        return np.asarray(x)
    x = np.asarray(x)
    counts = multihost_utils.process_allgather(
        np.asarray([x.shape[0]], np.int64)
    ).reshape(-1)
    m = int(counts.max())
    padded = np.zeros((m,) + x.shape[1:], x.dtype)
    padded[: x.shape[0]] = x
    stacked = multihost_utils.process_allgather(padded)  # (P, m, ...)
    return np.concatenate(
        [stacked[p, : int(c)] for p, c in enumerate(counts)]
    )

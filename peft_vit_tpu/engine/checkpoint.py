"""Checkpoint / auto-resume on Orbax.

Reference semantics (lib/utils/utils.py:101-203, tools/train.py:230-258):

* ``checkpoint.pth`` = {epoch, model name, state_dict, perf, optimizer,
  ema_shadow_states, swa_states}; rank-0 only; TRAIN.AUTO_RESUME picks up
  the latest on restart; ``model_best`` / ``final_state`` saved separately.

Here a single Orbax CheckpointManager holds the same composite state.  For
PEFT runs only the trainable subtree + optimizer state is saved (the frozen
backbone is content-addressed by the pretrained checkpoint path) — the
north-star "optimizer state proportional to adapter size" applies to disk
too.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def _manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        ),
    )


def save_checkpoint(
    directory: str,
    step: int,
    state: Dict[str, Any],
    is_master: Optional[bool] = None,
) -> None:
    """state: any pytree dict (trainable, opt, ema, swa, epoch, perf)."""
    import orbax.checkpoint as ocp

    if is_master is None:
        is_master = jax.process_index() == 0
    if jax.process_count() == 1 and not is_master:
        return
    # multi-process: every process calls save (Orbax's save is a
    # collective over global arrays); Orbax itself writes from the
    # primary process only — the reference's rank-0-only semantics
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    if is_master:
        logger.info("=> saved checkpoint step %d to %s", step, directory)


def latest_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(directory):
        return None
    try:
        mgr = _manager(directory)
        return mgr.latest_step()
    except Exception:
        return None


def checkpoint_keys(
    directory: str, step: Optional[int] = None
) -> Optional[set]:
    """Top-level keys stored in the latest checkpoint (None if unknown).
    Lets resume tolerate checkpoints that predate newly-tracked state
    (swa/ema/batch_stats) — absent keys stay freshly initialized."""
    step = step if step is not None else latest_step(directory)
    if step is None:
        return None
    try:
        meta = _manager(directory).item_metadata(step)
        return set(meta.keys()) if hasattr(meta, "keys") else None
    except Exception:
        return None


def restore_checkpoint(
    directory: str, template: Dict[str, Any], step: Optional[int] = None
) -> Optional[Dict[str, Any]]:
    """Restore into the shape of `template`; None when nothing to resume
    (TRAIN.AUTO_RESUME semantics: silently start fresh)."""
    import orbax.checkpoint as ocp

    step = step if step is not None else latest_step(directory)
    if step is None:
        return None
    mgr = _manager(directory)
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(template)
    )
    logger.info("=> resumed from %s step %d", directory, step)
    return restored


def dump_nan_state(path: str, **arrays) -> None:
    """NaN-loss forensic dump (lib/core/function.py:91-107: save
    {x, y, outputs, loss, states} then abort)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        **{
            k: np.asarray(jax.device_get(v))
            for k, v in arrays.items()
            if v is not None and not isinstance(v, dict)
        },
    )
    logger.error("=> NaN loss: dumped state to %s", path)

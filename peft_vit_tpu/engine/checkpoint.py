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


_managers: Dict[str, Any] = {}


def _manager(directory: str, max_to_keep: int = 3):
    # one manager per directory, cached: async (wait=False) saves stay
    # owned by a live manager, and consecutive saves to the same dir
    # serialize through it instead of racing across fresh instances
    import orbax.checkpoint as ocp

    key = os.path.abspath(directory)
    mgr = _managers.get(key)
    if mgr is None:
        mgr = ocp.CheckpointManager(
            key,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        _managers[key] = mgr
    return mgr


def save_checkpoint(
    directory: str,
    step: int,
    state: Dict[str, Any],
    is_master: Optional[bool] = None,
    wait: bool = True,
    overwrite: bool = False,
) -> None:
    """state: any pytree dict (trainable, opt, ema, swa, epoch, perf).

    ``wait=False`` returns as soon as Orbax has snapshotted the arrays to
    host (safe even with donated device buffers) and lets the disk write
    proceed in the background — mid-epoch preemption checkpoints overlap
    IO with training this way; Orbax serializes back-to-back saves
    itself.

    ``overwrite=True`` replaces an existing checkpoint at ``step``
    (Orbax treats a same-step save as a silent no-op otherwise)."""
    import orbax.checkpoint as ocp

    if is_master is None:
        is_master = jax.process_index() == 0
    if jax.process_count() == 1 and not is_master:
        return
    # multi-process: every process calls save (Orbax's save is a
    # collective over global arrays); Orbax itself writes from the
    # primary process only — the reference's rank-0-only semantics
    mgr = _manager(directory)
    if overwrite:
        mgr.wait_until_finished()
        if step in (mgr.all_steps() or ()):
            mgr.delete(step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    if is_master:
        logger.info(
            "=> saved checkpoint step %d to %s%s",
            step,
            directory,
            "" if wait else " (async)",
        )


def wait_for_saves(directory: str) -> None:
    """Block until any async (wait=False) save to `directory` has hit
    disk — call before process exit or before reading the directory."""
    mgr = _managers.get(os.path.abspath(directory))
    if mgr is not None:
        mgr.wait_until_finished()


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
    (swa/ema/batch_stats/rng/batch_in_epoch) — absent keys stay freshly
    initialized.  Reads the StandardSave item's ``_METADATA`` tree file
    directly: ``CheckpointManager.item_metadata`` needs a handler
    registry the bare manager doesn't have."""
    import json

    step = step if step is not None else latest_step(directory)
    if step is None:
        return None
    path = os.path.join(
        os.path.abspath(directory), str(step), "default", "_METADATA"
    )
    try:
        with open(path) as f:
            meta = json.load(f)
        keys = {
            entry["key_metadata"][0]["key"]
            for entry in meta["tree_metadata"].values()
        }
        return keys or None
    except Exception:
        try:
            m = _manager(directory).item_metadata(step)
            return set(m.keys()) if hasattr(m, "keys") else None
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

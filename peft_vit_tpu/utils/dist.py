"""Multi-host initialization (reference lib/utils/utils.py:55-67
init_distributed + utils/comm.py Comm singleton).

On TPU pods, one process per host joins via jax.distributed; the env-var
rendezvous (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) replaces the
reference's MASTER_ADDR/RANK NCCL setup.  On single host this is a no-op.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_initialized = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple[int, int]:
    """Returns (process_index, process_count). Safe to call repeatedly."""
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not _initialized and coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=(
                num_processes
                or int(os.environ.get("NUM_PROCESSES", "0")) or None
            ),
            process_id=(
                process_id
                if process_id is not None
                else (
                    int(os.environ["PROCESS_ID"])
                    if "PROCESS_ID" in os.environ
                    else None
                )
            ),
        )
        _initialized = True
        logger.info(
            "=> jax.distributed initialized: process %d/%d, %d local / %d "
            "global devices",
            jax.process_index(),
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """comm.is_main_process analog (utils/comm.py:44-47)."""
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()


def barrier(name: str = "barrier") -> None:
    """dist.barrier analog (utils/comm.py:54-61): a tiny psum across all
    devices forces every process to rendezvous."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)

"""TensorBoard scalar logging.

The reference logs per-epoch scalars through tensorboardX
(``tools/train.py:101-105`` creates the writer_dict;
``lib/core/function.py:165-170`` writes ``train_loss``/``train_top1`` and
``:258-263`` writes ``valid_loss``/``valid_top1``, main process only).

Here the writer is an optional observability sink next to the structured
``metrics.jsonl``: created only on process 0, and only when a TensorBoard
backend is importable — otherwise ``create_scalar_writer`` returns None and
the Trainer skips it, so the framework carries no hard tensorboard
dependency.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


class ScalarWriter:
    """Thin add_scalar/close wrapper over torch's SummaryWriter."""

    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter

        self._writer = SummaryWriter(log_dir=log_dir)
        self.log_dir = log_dir

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._writer.add_scalar(tag, float(value), int(step))

    def flush(self) -> None:
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()


def create_scalar_writer(log_dir: str) -> Optional[ScalarWriter]:
    """Rank-0 ScalarWriter, or None when unavailable.

    Mirrors the reference's ``comm.is_main_process()`` gate on every
    writer_dict use (function.py:165,258): non-zero processes never
    create a writer, so multi-host runs produce one event file.
    """
    import jax

    if jax.process_index() != 0:
        return None
    try:
        return ScalarWriter(log_dir)
    except Exception as e:  # tensorboard missing or log_dir unwritable
        logger.warning("tensorboard writer disabled: %s", e)
        return None

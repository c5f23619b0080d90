from .logging import (
    create_logger,
    final_result_line,
    log_trainable_params,
    setup_logger,
)
from .results import append_jsonl, read_log_results, summarize

__all__ = [
    "append_jsonl",
    "create_logger",
    "final_result_line",
    "log_trainable_params",
    "read_log_results",
    "setup_logger",
    "summarize",
]

from .logging import (
    create_logger,
    final_result_line,
    log_trainable_params,
    setup_logger,
)
from .results import append_jsonl, read_log_results, summarize
from .dist import barrier, init_distributed, is_main_process, world_size
from .profiling import (
    MetricsWriter,
    StepTimer,
    enable_anomaly_detection,
    trace,
)
from .submission import PredictionSubmission, submit_predictions
from .summary import bytes_accessed_of, flops_of, param_summary

__all__ = [
    "append_jsonl",
    "create_logger",
    "final_result_line",
    "log_trainable_params",
    "read_log_results",
    "setup_logger",
    "summarize",
]

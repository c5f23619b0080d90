"""Debugging driver: the unified fine-tune path under full forensics.

The reference keeps a scratch copy of its fine-tune driver for debugging
sessions (commands/debugging.py:1-160 driving evaluation/debugging.py:
549-620 — a 1,132-line clone of the finetune stack with the same CLI).
The TPU-native equivalent is not another copy: it is the SAME
``finetune_main`` path (commands/run.py) forced into debug mode, so a
debugging run exercises exactly the code being debugged:

* ``jax_debug_nans`` on (the reference's TRAIN.DETECT_ANOMALY =
  torch ``set_detect_anomaly``, tools/train.py:159) — every dispatch
  re-runs op-by-op on a NaN and names the producing primitive;
* optional ``--no-jit``: run the whole step eagerly (op-by-op on
  device) so Python tracebacks point at the failing line — the JAX
  analog of torch eager mode, which is what the reference's scratch
  driver was for;
* optional ``--check-leaks``: ``jax.checking_leaks`` context to catch
  tracer leaks in user-modified model code;
* DEBUG-level logging everywhere, single epoch by default, sweep off.

Shares ``add_finetuning_args`` (--ds/--model/--method/--lr/--l2/opts),
so any ``pvt_run`` invocation becomes a debugging session by swapping
the command name.
"""

from __future__ import annotations

import argparse
import contextlib
import logging

from .common import add_finetuning_args, load_config, setup_run_logger
from .run import finetune_main

logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="PEFT fine-tune under debug forensics (pvt_run "
        "with jax_debug_nans, optional eager mode and leak checking)"
    )
    add_finetuning_args(parser)
    parser.add_argument(
        "--no-jit",
        dest="no_jit",
        action="store_true",
        help="run the step eagerly (jax.disable_jit) so tracebacks "
        "point at the failing Python line",
    )
    parser.add_argument(
        "--check-leaks",
        dest="check_leaks",
        action="store_true",
        help="enable jax.checking_leaks tracer-leak detection",
    )
    parser.add_argument(
        "--full",
        action="store_true",
        help="keep the configured epoch count and sweep (default: "
        "1 epoch, sweep off, for a fast repro loop)",
    )
    args = parser.parse_args(argv)
    cfg = load_config(args)
    cfg.TRAIN.DETECT_ANOMALY = True
    if args.no_tuning or not args.full:
        cfg.TRAIN.NO_TUNING = True
    if not args.full:
        cfg.TRAIN.END_EPOCH = min(int(cfg.TRAIN.END_EPOCH), 1)
    logging.getLogger("peft_vit_tpu").setLevel(logging.DEBUG)
    out = setup_run_logger(cfg)
    cfg.freeze()

    import jax

    from ..utils.profiling import enable_anomaly_detection

    enable_anomaly_detection(True)
    stack = contextlib.ExitStack()
    if args.no_jit:
        logger.info("=> debug: jit DISABLED (eager op-by-op)")
        stack.enter_context(jax.disable_jit())
    if args.check_leaks:
        logger.info("=> debug: tracer-leak checking ON")
        stack.enter_context(jax.checking_leaks())
    with stack:
        score = finetune_main(cfg, out)
    return score


if __name__ == "__main__":
    main()

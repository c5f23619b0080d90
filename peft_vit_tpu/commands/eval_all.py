"""Multi-dataset evaluation orchestrator.

Reference: full_shot tools/eval.py:18-95 spawns tools/linear_probe.py per
dataset via subprocess; few_shot drives methods one dataset at a time.
Here one in-process loop runs (dataset x shot x seed) through the finetune
driver, collects results.jsonl, and prints the summary table
(read_results.extract_finetune_results analog).
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..config import get_default_config
from ..utils.results import summarize
from .common import fix_seeds
from .run import finetune_main

logger = logging.getLogger(__name__)


def main(argv=None):
    p = argparse.ArgumentParser(description="multi-dataset PEFT eval")
    p.add_argument("--model", required=False, default=None)
    p.add_argument(
        "--datasets",
        nargs="+",
        required=True,
        help="dataset yaml paths or names",
    )
    p.add_argument("--method", default="lora")
    p.add_argument("--shots", nargs="+", type=int, default=[5])
    p.add_argument("--seeds", nargs="+", type=int, default=[0])
    p.add_argument("--output", default="output")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    results = {}
    ds_names = []
    for ds in args.datasets:
        for n in args.shots:
            for seed in args.seeds:
                cfg = get_default_config()
                if args.model:
                    cfg.merge_from_file(args.model)
                if os.path.exists(ds):
                    cfg.merge_from_file(ds)
                else:
                    cfg.DATASET.DATASET = ds
                if args.opts:
                    cfg.merge_from_list(args.opts)
                cfg.PEFT.METHOD = args.method
                cfg.DATASET.NUM_SAMPLES_PER_CLASS = n
                cfg.DATASET.RANDOM_SEED_SAMPLING = seed
                cfg.OUTPUT_DIR = args.output
                cfg.NAME = cfg.NAME or f"{args.method}"
                name = cfg.DATASET.DATASET
                if name not in ds_names:
                    ds_names.append(name)
                from ..utils.logging import create_logger

                out = create_logger(cfg, f"finetuning_{n}")
                cfg.freeze()
                fix_seeds(seed)
                try:
                    score = finetune_main(cfg, out)
                except Exception as e:  # sweep-cell semantics: score 0
                    logger.exception("run failed: %s", e)
                    score = 0.0
                results[(name, n, seed)] = score

    table = summarize(args.output, ds_names, args.shots, args.seeds)
    print("\n=== summary (mean over seeds) ===")
    for ds in ds_names:
        row = "  ".join(
            f"{n}-shot: {table[ds][n]:.2f}" for n in args.shots
        )
        print(f"{ds:<40s} {row}")
    avg = np.nanmean(
        [table[ds][n] for ds in ds_names for n in args.shots]
    )
    print(f"{'AVERAGE':<40s} {avg:.2f}")
    return results


if __name__ == "__main__":
    main()

"""BiT-HyperRule fine-tuning (reference tools/bit_finetune.py:98-275).

Big-Transfer's step-based schedule: total steps and decay boundaries are a
function of dataset size; SGD momentum 0.9, base lr scaled by batch/512,
no weight decay, mixup for larger datasets.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from ..config import get_default_config
from ..data import construct_splits
from ..engine.trainer import Trainer, batch_iterator
from ..models.factory import build_image_classifier
from ..peft import build_mask, spec_from_config
from ..utils.logging import create_logger, final_result_line

logger = logging.getLogger(__name__)


def bit_hyperrule(n_examples: int):
    """(total_steps, decay boundaries) per the BiT paper."""
    if n_examples < 20_000:
        return 500, (200, 300, 400)
    if n_examples < 500_000:
        return 10_000, (3000, 6000, 9000)
    return 20_000, (6000, 12_000, 18_000)


def bit_main(cfg) -> float:
    splits = construct_splits(cfg)
    spec = spec_from_config(cfg)
    model, variables, _ = build_image_classifier(
        cfg, spec, splits.num_classes
    )
    params = variables["params"]
    mask = build_mask(params, "full", num_layers=12)

    batch = int(cfg.TRAIN.BATCH_SIZE_PER_GPU)
    n = len(splits.y_train)
    total_steps, boundaries = bit_hyperrule(n)
    steps_per_epoch = max(n // batch, 1)
    epochs = max(total_steps // steps_per_epoch, 1)

    cfg.defrost()
    cfg.TRAIN.END_EPOCH = epochs
    cfg.TRAIN.LR = float(cfg.FINETUNE.BASE_LR) * batch / 512.0
    cfg.TRAIN.WD = 0.0
    cfg.TRAIN.LR_SCHEDULER.METHOD = "step"
    cfg.TRAIN.SCHEDULE = [
        b // steps_per_epoch for b in boundaries
    ]
    cfg.AUG.MIXUP = 0.1 if n >= 20_000 else 0.0
    cfg.freeze()

    trainer = Trainer(
        cfg, model, params, mask, steps_per_epoch,
        batch_stats=variables.get("batch_stats"),
    )
    best = trainer.fit(
        lambda e: batch_iterator(
            splits.x_train, splits.y_train, batch, seed=e
        ),
        lambda: batch_iterator(
            splits.x_test,
            splits.y_test,
            batch,
            shuffle=False,
            drop_last=False,
        ),
        tb_log_dir=os.path.join(
            cfg.OUTPUT_DIR, cfg.DATASET.DATASET, cfg.NAME, "tb_log"
        ),
    )
    final_result_line("accuracy", best)
    return best


def main(argv=None):
    p = argparse.ArgumentParser(description="BiT fine-tune")
    p.add_argument("--cfg", default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)
    cfg = get_default_config()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.NAME = cfg.NAME or "bit_finetune"
    create_logger(cfg, "bit_finetune")
    return bit_main(cfg)


if __name__ == "__main__":
    main()

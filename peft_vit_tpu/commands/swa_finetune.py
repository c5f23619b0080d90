"""SWA fine-tuning tool.

Reference: full_shot/main/tools/swa_finetune.py:74-304 — continue from a
completed full-shot run with the SWALR schedule, maintain the running
equal-weight average of the weights (torch.optim.swa_utils.AveragedModel),
refresh BN running statistics for the averaged weights (update_bn), then
evaluate and checkpoint.

Here it is a thin override layer on the full-shot trainer: force
``SWA.ENABLED`` + the ``swalr`` schedule, auto-resume the prior
checkpoint, and let ``Trainer.fit`` handle averaging + the BN refresh.

    python -m peft_vit_tpu.commands.swa_finetune --cfg experiments/r50.yaml \
        TRAIN.END_EPOCH 110 SWA.BEGIN_EPOCH 100
"""

from __future__ import annotations

import argparse
import os

from ..config import get_default_config
from ..utils.logging import create_logger
from .train import train_main


def main(argv=None):
    parser = argparse.ArgumentParser(description="SWA fine-tuning")
    parser.add_argument("--cfg", required=False, default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)
    cfg = get_default_config()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
        cfg.NAME = cfg.NAME or os.path.splitext(
            os.path.basename(args.cfg)
        )[0]
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.SWA.ENABLED = True
    if int(cfg.SWA.BEGIN_EPOCH) < 0:
        cfg.SWA.BEGIN_EPOCH = int(cfg.TRAIN.BEGIN_EPOCH)
    cfg.TRAIN.LR_SCHEDULER.METHOD = "swalr"
    cfg.TRAIN.AUTO_RESUME = True
    cfg.NAME = cfg.NAME or "swa_finetune"
    create_logger(cfg, "swa_finetune")
    cfg.freeze()
    return train_main(cfg)


if __name__ == "__main__":
    main()

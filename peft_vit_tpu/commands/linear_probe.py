"""Linear / logistic probe command (reference commands/linear_probe.py).

``--classifier logistic`` -> frozen features + L-BFGS logistic with the
97-point C sweep (TPU-vmapped; evaluation/logistic_classifier.py protocol).
``--classifier linear``  -> the finetune driver with PEFT.METHOD=linear
and FREEZE_IMAGE_BACKBONE (reference maps it onto full_model_finetune with
the backbone frozen, commands/linear_probe.py:183-195).
"""

from __future__ import annotations

import argparse
import logging
import os

import jax.numpy as jnp
import numpy as np

from ..data import construct_splits
from ..engine.probes import logistic_probe_sweep
from ..engine.zeroshot import extract_image_features
from ..models.factory import build_image_classifier
from ..peft import PEFTSpec
from ..utils.logging import final_result_line, log_trainable_params
from .common import add_finetuning_args, load_config, setup_run_logger
from .run import finetune_main

logger = logging.getLogger(__name__)


def logistic_main(cfg, out_dir: str) -> float:
    splits = construct_splits(cfg)
    model, variables, _ = build_image_classifier(
        cfg, PEFTSpec(), splits.num_classes
    )

    from ..models.factory import backbone_eval_variables

    eval_vars = backbone_eval_variables(variables)

    def encode_image(x):
        return model.backbone.apply(eval_vars, jnp.asarray(x))

    cache_dir = os.path.join(out_dir, "feature_cache")
    batch = int(cfg.TEST.BATCH_SIZE_PER_GPU)

    def feats(x, tag):
        return extract_image_features(
            encode_image,
            x,
            batch_size=batch,
            cache_path=os.path.join(
                cache_dir,
                f"{cfg.DATASET.DATASET}_{tag}_"
                f"{cfg.DATASET.NUM_SAMPLES_PER_CLASS}_"
                f"{cfg.DATASET.RANDOM_SEED_SAMPLING}.npz",
            ),
        )

    ftr = feats(splits.x_train, "train")
    fva = feats(splits.x_val, "val")
    fte = feats(splits.x_test, "test")
    acc, best_c = logistic_probe_sweep(
        ftr,
        splits.y_train,
        fva,
        splits.y_val,
        fte,
        splits.y_test,
        splits.num_classes,
        log_lower=float(cfg.TRAIN.SEARCH_WD_LOG_LOWER),
        log_upper=float(cfg.TRAIN.SEARCH_WD_LOG_UPPER),
    )
    log_trainable_params(
        (ftr.shape[1] + 1) * splits.num_classes
    )
    final_result_line("accuracy", acc)
    return acc


def main(argv=None):
    parser = argparse.ArgumentParser(description="linear/logistic probe")
    add_finetuning_args(parser)
    args = parser.parse_args(argv)
    cfg = load_config(args)
    out = setup_run_logger(cfg, "linear_probe")
    if args.classifier == "logistic":
        cfg.freeze()
        return logistic_main(cfg, out)
    cfg.PEFT.METHOD = "linear"
    cfg.TRAIN.FREEZE_IMAGE_BACKBONE = True
    cfg.freeze()
    return finetune_main(cfg, out)


if __name__ == "__main__":
    main()

"""Zero-shot evaluation command (reference commands/zeroshot_eval.py:106-164).

Extract test image features with the frozen CLIP visual tower, build the
text classifier from prompt templates, score ``100 * img @ text^T``.
"""

from __future__ import annotations

import argparse
import logging

import jax.numpy as jnp
import numpy as np

from ..data import construct_splits
from ..engine.metrics import metric_for_dataset
from ..engine.zeroshot import (
    clip_zeroshot_evaluator,
    extract_image_features,
    extract_text_features,
)
from ..models.factory import build_image_classifier
from ..peft import PEFTSpec
from ..utils.logging import final_result_line
from .common import add_finetuning_args, load_config, setup_run_logger

logger = logging.getLogger(__name__)


def zeroshot_main(cfg) -> float:
    splits = construct_splits(cfg, test_split_only=True)
    model, variables, encode_text = build_image_classifier(
        cfg, PEFTSpec(), splits.num_classes
    )
    if encode_text is None:
        raise ValueError(
            "zero-shot evaluation needs a CLIP checkpoint with a text "
            "tower (MODEL.PRETRAINED)"
        )

    from ..models.factory import backbone_eval_variables

    eval_vars = backbone_eval_variables(variables)

    def encode_image(x):
        return model.backbone.apply(eval_vars, jnp.asarray(x))

    img_feats = extract_image_features(
        encode_image,
        splits.x_test,
        batch_size=int(cfg.TEST.BATCH_SIZE_PER_GPU),
    )
    text_feats = extract_text_features(encode_text, cfg)
    metric_name = cfg.TEST.METRIC or metric_for_dataset(
        cfg.DATASET.DATASET
    )
    score, _ = clip_zeroshot_evaluator(
        img_feats, text_feats, splits.y_test, metric_name
    )
    final_result_line(metric_name, float(score))
    return float(score)


def main(argv=None):
    parser = argparse.ArgumentParser(description="CLIP zero-shot eval")
    add_finetuning_args(parser)
    args = parser.parse_args(argv)
    cfg = load_config(args)
    setup_run_logger(cfg, "zeroshot")
    cfg.freeze()
    return zeroshot_main(cfg)


if __name__ == "__main__":
    main()

"""The PEFT fine-tuning driver.

One program replaces the reference's 24 per-method command scripts
(SURVEY §2.1/2.2): ``pvt_run --method lora --ds cfg/cifar10.yaml --model
cfg/vitb32_clip.yaml`` runs the full flagship path of SURVEY §3.1:

  config -> data (few-shot sample + balanced split) -> model build/graft ->
  trainable mask -> lr x wd sweep -> final train on train+val (+extra
  epochs) -> test metric -> reference-shaped logs + results.jsonl
"""

from __future__ import annotations

import argparse
import logging
import sys
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import construct_splits, merge_trainval
from ..engine import (
    SweepEngine,
    bce_per_example,
    ce_per_example,
    make_array_task,
)
from ..engine.contrastive import hybrid_contrastive_per_example
from ..engine.metrics import metric_for_dataset
from ..engine.zeroshot import extract_text_features
from ..models.factory import build_image_classifier, init_head_from_text
from ..peft import (
    build_mask,
    count_trainable,
    describe_mask,
    spec_from_config,
    split_params,
)
from ..utils.logging import final_result_line, log_trainable_params
from ..utils.results import append_jsonl
from .common import add_finetuning_args, fix_seeds, load_config, setup_run_logger

logger = logging.getLogger(__name__)


def finetune_main(cfg, out_dir: Optional[str] = None) -> float:
    fix_seeds(int(cfg.DATASET.RANDOM_SEED_SAMPLING))
    spec = spec_from_config(cfg)
    logger.info("=> PEFT method: %s (%s)", cfg.PEFT.METHOD, spec)

    splits = construct_splits(cfg)
    num_classes = splits.num_classes
    criterion = bce_per_example if splits.multilabel else ce_per_example

    contrastive = spec.method in (
        "finetune_contrast",
        "linear_probe_contrast",
    )
    # the reference's Classifier carries channel_bn =
    # BatchNorm1d(affine=False) in every few-shot driver
    # (full_model_finetune.py:98-101); the contrastive Classifier does
    # not (linear_classifier_contrast.py:62-98 has no BatchNorm)
    use_bn = bool(cfg.TRAIN.CHANNEL_BN) and not contrastive
    model, variables, encode_text = build_image_classifier(
        cfg, spec, num_classes, use_bn=use_bn
    )
    params = variables["params"]

    if contrastive:
        # swap the linear head for the frozen class-text feature bank +
        # fresh logit_scale (linear_classifier_contrast.py Classifier)
        from ..data.prompts import class_map
        from ..models.classifier import ContrastiveClassifier

        if encode_text is None:
            raise ValueError(
                f"--method {spec.method} needs a CLIP model (text tower)"
            )
        classnames = class_map(cfg.DATASET.DATASET, cfg.DATASET.ROOT) or [
            f"class {i}" for i in range(num_classes)
        ]
        text_feats = np.asarray(
            extract_text_features(encode_text, cfg, classnames=classnames)
        )
        model = ContrastiveClassifier(
            backbone=model.backbone, text_features=text_feats
        )
        params = {
            "backbone": params["backbone"],
            "logit_scale": jnp.ones((), jnp.float32),
        }
        criterion = hybrid_contrastive_per_example

    if bool(cfg.TRAIN.INIT_HEAD_WITH_TEXT_ENCODER) and not contrastive and encode_text:
        text_feats = np.asarray(extract_text_features(encode_text, cfg))
        aux = variables.get("aux") or {}
        if "visual_proj" in aux:
            # MERGE_ENCODER_AND_HEAD_PROJ: head kernel = proj @ text^T
            text_feats = text_feats @ np.asarray(aux["visual_proj"]).T
        scale = 1.0
        if bool(cfg.TRAIN.INIT_HEAD_WITH_LOGIT_SCALE):
            # the reference multiplies the head by the CHECKPOINT's
            # trained backbone.logit_scale.exp()
            # (full_model_finetune.py:133-134); 2.659 = ln(100) is
            # CLIP's converged value, used only when the checkpoint
            # carries none
            scale = float(np.exp(aux.get("logit_scale", 2.659)))
        params = init_head_from_text(params, text_feats, scale)
        logger.info("=> head initialized from text encoder")

    num_layers = (
        model.backbone.layers
        if hasattr(model.backbone, "layers")
        else 12
    )
    mask = build_mask(
        params,
        spec.method if spec.method != "none" else "linear",
        num_layers=num_layers,
        train_head=bool(cfg.PEFT.TRAIN_HEAD),
        extra_regex=str(cfg.PEFT.TRAINABLE_REGEX),
        adapter_layers=spec.adapter_layers,
    )
    logger.info("trainable:\n%s", describe_mask(params, mask))
    log_trainable_params(count_trainable(params, mask))
    trainable0, frozen = split_params(params, mask)

    # captured eagerly: `splits` may be rebound to token arrays by the
    # cached-backbone path below, but init always runs the image path
    init_shape = tuple(splits.x_train.shape[1:])

    # Per-cell re-init (the reference builds a fresh Classifier per cell,
    # adapter_tuning_clip.py:231 — which RE-LOADS the pretrained backbone
    # and randomizes only injected PEFT leaves + head).  Methods whose
    # trainables are pretrained-backbone subsets (full, bitfit, layernorm,
    # attention, first_*, contrastive) must reset those leaves to the
    # grafted values, not to random init.
    injected = spec.method in (
        "lora", "lora_fix_one", "lora_moe", "lora_adapter",
        "lora_compacter", "lora_drop_adapter", "adapter", "adapterdrop",
        "compacter", "kadaptation", "rpb", "lepe", "transformer_probe",
        "vpt",
    )
    fresh_mask = (
        mask
        if injected
        else build_mask(
            params,
            "linear",  # head (and logit_scale below) only
            num_layers=num_layers,
            train_head=bool(cfg.PEFT.TRAIN_HEAD),
            extra_regex="logit_scale",
        )
    )
    from flax import traverse_util

    _flat_params = traverse_util.flatten_dict(params, sep="/")
    _flat_mask = traverse_util.flatten_dict(mask, sep="/")
    _flat_fresh = traverse_util.flatten_dict(fresh_mask, sep="/")

    def init_trainable(rng):
        p = model.init(rng, jnp.zeros((1, *init_shape)))["params"]
        flat_new = traverse_util.flatten_dict(p, sep="/")
        out = {
            k: (
                (flat_new[k] if _flat_fresh[k] else _flat_params[k])
                if _flat_mask[k]
                else None
            )
            for k in flat_new
        }
        return traverse_util.unflatten_dict(out, sep="/")

    # **kw forwards mutable=["batch_stats"] when the model carries BN
    # state (channel_bn head and/or live-BN towers)
    apply_fn = lambda v, x, train, **kw: model.apply(v, x, train, **kw)

    # cached-backbone sweep: precompute frozen activations through the
    # deepest all-frozen prefix and train only the suffix (engine/cached.py)
    from ..engine.cached import maybe_cache_prefix

    cached = maybe_cache_prefix(
        cfg, model, params, mask, num_layers, splits
    )
    if cached is not None:
        apply_fn, splits, _cut = cached

    metric_name = cfg.TEST.METRIC or metric_for_dataset(
        cfg.DATASET.DATASET
    )
    # TPU.INT8_FWD_TRAIN: pre-quantize the frozen tower ONCE for the
    # whole sweep (every cell shares it) — without this the Int8Dense
    # layers fall back to re-quantizing the weights inside every step
    qk = None
    if bool(cfg.TPU.get("INT8_FWD_TRAIN", False)):
        from ..ops.int8 import quantize_frozen_tree

        int8_targets = tuple(
            cfg.TPU.get(
                "INT8_TARGETS", ["in_proj", "out_proj", "c_fc", "c_proj"]
            )
        )
        qk = jax.jit(
            lambda f: quantize_frozen_tree(
                f,
                targets=int8_targets,
                bwd_dx=bool(cfg.TPU.get("INT8_BWD_DX", False)),
            )
        )(frozen)
    engine = SweepEngine(
        cfg, apply_fn, init_trainable, frozen, criterion,
        metric=metric_name,
        bn_template=variables.get("batch_stats"),
        qkernel=qk,
    )

    batch = int(cfg.TRAIN.BATCH_SIZE_PER_GPU)
    task = make_array_task(
        splits.x_train, splits.y_train, splits.x_val, splits.y_val, batch
    )
    end_epoch = int(cfg.TRAIN.END_EPOCH)

    no_tuning = bool(cfg.TRAIN.get("NO_TUNING", False))
    if no_tuning:
        best_lr = float(cfg.TRAIN.LR)
        best_wd = float(cfg.TRAIN.WD)
    else:
        best_lr, best_wd, _ = engine.sweep(task, end_epoch)

    # final run: merge train+val, extra epochs (adapter_tuning_clip.py:429-481)
    # protocol lines match the reference exactly
    # (full_model_finetune.py:426-427,446) so log-schema tooling parses
    # both frameworks' logs identically
    logger.info("=> The final classifier is on training ...")
    logger.info(
        "Hyperparameters: learning_rate = %s, l2_lambda = %s",
        best_lr,
        best_wd,
    )
    xt, yt = merge_trainval(splits)
    logger.info(
        "Using the full trainval set to train final model. len(dataset)=%d",
        len(yt),
    )
    final_task = make_array_task(
        xt, yt, splits.x_test, splits.y_test, batch
    )
    final_epochs = end_epoch + int(cfg.TRAIN.EXTRA_FINAL_TRAIN_EPOCH)
    state, _ = engine.train_final(
        best_lr, best_wd, final_task, final_epochs
    )

    logits = engine._eval_one(
        state.trainable, frozen, final_task.x_val, state.bn
    )
    score = engine._score_one(
        logits, final_task.y_val, final_task.valid_val
    )

    if out_dir:
        append_jsonl(
            f"{out_dir}/results.jsonl",
            {
                "dataset": cfg.DATASET.DATASET,
                "method": cfg.PEFT.METHOD,
                "num_shots": int(cfg.DATASET.NUM_SAMPLES_PER_CLASS),
                "seed": int(cfg.DATASET.RANDOM_SEED_SAMPLING),
                "lr": best_lr,
                "wd": best_wd,
                "metric": metric_name,
                "score": float(score),
                "trainable_params": count_trainable(params, mask),
                "time": time.time(),
            },
        )
    final_result_line(metric_name, float(score))
    return float(score)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="PEFT fine-tuning on TPU"
    )
    add_finetuning_args(parser)
    args = parser.parse_args(argv)
    cfg = load_config(args)
    if args.no_tuning:
        cfg.TRAIN.NO_TUNING = True
    out = setup_run_logger(cfg)
    cfg.freeze()
    score = finetune_main(cfg, out)
    return score


if __name__ == "__main__":
    main()

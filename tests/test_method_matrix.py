"""End-to-end method matrix: every PEFT method through the finetune
driver (tiny model, no sweep). The strongest single guarantee that the
full config -> data -> model -> mask -> train -> metric path works for
each method the reference ships."""

import numpy as np
import pytest

from peft_vit_tpu.commands.run import finetune_main
from peft_vit_tpu.config import get_default_config

METHODS = [
    "linear",
    "full",
    "bitfit",
    "layernorm",
    "attention",
    "lora",
    "lora_fix_one",
    "lora_moe",
    "adapter",
    "adapterdrop",
    "kadaptation",
    "rpb",
    "lepe",
    "transformer_probe",
    "vpt",
    "first_attention",
    "first_mlp",
    "lora_adapter",
]
# compacter variants need width % 32 == 0 and down_size % 4 == 0
WIDE_METHODS = ["compacter", "lora_compacter"]


def run_method(method, width=32, heads=2, dataset="synthetic"):
    cfg = get_default_config()
    cfg.DATASET.DATASET = dataset
    cfg.DATASET.NUM_CLASSES = 4
    cfg.DATASET.NUM_SAMPLES_PER_CLASS = 3
    cfg.TRAIN.IMAGE_SIZE = [16, 16]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.SCHEDULE = []
    cfg.TRAIN.NO_TUNING = True
    cfg.TRAIN.LR = 0.02
    cfg.TRAIN.WD = 1e-4
    cfg.MODEL.NAME = "clip_tiny"
    cfg.MODEL.SPEC.EMBED_DIM = 32
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = width
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = heads
    cfg.PEFT.METHOD = method
    cfg.PEFT.ADAPTER_LAYERS = [1]
    cfg.PEFT.PHM_DIM = 4
    if method.endswith("contrast"):
        cfg.MODEL.SPEC.TEXT.WIDTH = 32
        cfg.MODEL.SPEC.TEXT.LAYERS = 2
        cfg.MODEL.SPEC.TEXT.HEADS = 2
        cfg.MODEL.SPEC.TEXT.CONTEXT_LENGTH = 16
    np.random.seed(0)
    return finetune_main(cfg)


@pytest.mark.parametrize("method", METHODS)
def test_method_end_to_end(method):
    score = run_method(method)
    assert np.isfinite(score) and 0.0 <= score <= 100.0


@pytest.mark.parametrize("method", WIDE_METHODS)
def test_wide_method_end_to_end(method):
    score = run_method(method, width=96, heads=2)
    assert np.isfinite(score) and 0.0 <= score <= 100.0


@pytest.mark.parametrize(
    "method", ["finetune_contrast", "linear_probe_contrast"]
)
def test_contrastive_end_to_end(method):
    # HybridContrastive fine-tune against the frozen class-text bank
    # (linear_classifier_contrast.py) through the flagship driver
    score = run_method(method)
    assert np.isfinite(score) and 0.0 <= score <= 100.0


@pytest.mark.parametrize("method", ["linear", "lora"])
def test_multilabel_end_to_end(method):
    # the VOC2007/ChestX-ray8 shape: (B, C) binary targets, BCE loss,
    # mAP scoring through the flagship driver (crashed in round 1)
    score = run_method(method, dataset="synthetic_multilabel")
    assert np.isfinite(score) and 0.0 <= score <= 100.0

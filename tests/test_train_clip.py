"""CLIP pre-training driver: loss decreases; GATHER_TENSORS global-batch
path compiles and runs on the virtual device mesh."""

import numpy as np
import pytest

from peft_vit_tpu.commands.train_clip import train_clip_main
from peft_vit_tpu.config import get_default_config


def _cfg(gather=False):
    cfg = get_default_config()
    cfg.DATASET.DATASET = "synthetic"
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TRAIN.IMAGE_SIZE = [16, 16]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 2
    cfg.TRAIN.BEGIN_EPOCH = 0
    cfg.TRAIN.END_EPOCH = 3
    cfg.TRAIN.LR = 0.005
    cfg.TRAIN.OPTIMIZER = "adamW"
    cfg.TRAIN.LR_SCHEDULER.METHOD = "constant"
    cfg.PRINT_FREQ = 1
    cfg.OUTPUT_DIR = ""
    cfg.MODEL.NAME = "clip_tiny"
    cfg.MODEL.SPEC.EMBED_DIM = 32
    cfg.MODEL.SPEC.GATHER_TENSORS = gather
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = 32
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = 2
    cfg.MODEL.SPEC.TEXT.WIDTH = 32
    cfg.MODEL.SPEC.TEXT.LAYERS = 2
    cfg.MODEL.SPEC.TEXT.HEADS = 2
    cfg.MODEL.SPEC.TEXT.CONTEXT_LENGTH = 16
    cfg.PEFT.METHOD = "full"
    cfg.TPU.FLASH_ATTENTION = False
    return cfg


class TestTrainClip:
    def test_loss_finite_and_decreases(self, caplog):
        cfg = _cfg(gather=False)
        cfg.freeze()
        final = train_clip_main(cfg)
        assert np.isfinite(final)
        # InfoNCE over a global batch of B starts near ln(B)
        assert final < 10.0

    def test_gather_tensors_global_batch(self):
        import jax

        if jax.device_count() < 2:
            pytest.skip("needs a multi-device mesh")
        cfg = _cfg(gather=True)
        cfg.freeze()
        final = train_clip_main(cfg)
        assert np.isfinite(final)

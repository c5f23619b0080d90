"""Full-shot trainer tests: optax path, EMA/SWA, resume, NaN guard."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.data import synthetic_dataset
from peft_vit_tpu.engine.trainer import Trainer, batch_iterator
from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.peft import PEFTSpec, build_mask


def make_cfg(**over):
    cfg = get_default_config()
    cfg.DATASET.DATASET = "synthetic"
    cfg.DATASET.NUM_CLASSES = 4
    cfg.MODEL.NUM_CLASSES = 4
    cfg.TRAIN.IMAGE_SIZE = [16, 16]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TRAIN.END_EPOCH = 2
    cfg.TRAIN.LR = 0.01
    cfg.TRAIN.LR_SCHEDULER.METHOD = "warmupcosine"
    cfg.TRAIN.LR_SCHEDULER.WARMUP_EPOCH = 1
    for k, v in over.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def make_model(spec=PEFTSpec()):
    vit = VisionTransformer(
        image_size=16,
        patch_size=8,
        width=32,
        layers=2,
        heads=2,
        style="timm",
        spec=spec,
        use_flash=False,
    )
    return ImageClassifier(backbone=vit, num_classes=4)


def setup(cfg, method="full"):
    model = make_model()
    x0 = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    mask = build_mask(params, method, num_layers=2)
    return model, params, mask


class TestTrainer:
    def test_loss_decreases(self):
        # END_EPOCH bounds the cosine schedule: train exactly that long
        cfg = make_cfg(**{"TRAIN.END_EPOCH": 6, "TRAIN.LR": 0.05})
        model, params, mask = setup(cfg)
        x, y = synthetic_dataset(4, 16, 16)
        x = x.astype(np.float32) / 255.0
        trainer = Trainer(cfg, model, params, mask, steps_per_epoch=8)
        s0 = trainer.train_one_epoch(
            batch_iterator(x, y, 8, seed=0), epoch=0
        )
        stats = s0
        for e in range(1, 6):
            stats = trainer.train_one_epoch(
                batch_iterator(x, y, 8, seed=e), epoch=e
            )
        assert stats["loss"] < s0["loss"]
        acc = trainer.evaluate(
            batch_iterator(x, y, 8, shuffle=False, drop_last=False)
        )
        assert acc > 30.0, acc  # train-set accuracy beats 25% chance

    def test_ema_swa_tracked(self):
        cfg = make_cfg(**{"TRAIN.EMA_DECAY": 0.9, "SWA.ENABLED": True,
                          "SWA.BEGIN_EPOCH": 0})
        model, params, mask = setup(cfg)
        x, y = synthetic_dataset(4, 8, 16)
        x = x.astype(np.float32) / 255.0
        trainer = Trainer(cfg, model, params, mask, steps_per_epoch=4)
        trainer.train_one_epoch(batch_iterator(x, y, 8), epoch=0)
        assert trainer.state.ema is not None
        assert int(trainer.state.swa.count) > 0
        acc = trainer.evaluate(
            batch_iterator(x, y, 8, shuffle=False), use_ema=True
        )
        assert np.isfinite(acc)

    def test_nan_guard(self, tmp_path):
        cfg = make_cfg(**{"TRAIN.LR": 1e12, "OUTPUT_DIR": str(tmp_path),
                          "PRINT_FREQ": 1})
        model, params, mask = setup(cfg)
        x, y = synthetic_dataset(4, 16, 16)
        x = (x.astype(np.float32) / 255.0) * 1e6  # blow it up
        trainer = Trainer(cfg, model, params, mask, steps_per_epoch=8)
        with pytest.raises(FloatingPointError):
            for e in range(5):
                trainer.train_one_epoch(
                    batch_iterator(x, y, 8, seed=e), epoch=e
                )
        dumps = list(tmp_path.glob("nan_dump_*.npz"))
        assert dumps, "forensic dump written"

    def test_checkpoint_resume(self, tmp_path):
        cfg = make_cfg()
        model, params, mask = setup(cfg, method="bitfit")
        x, y = synthetic_dataset(4, 8, 16)
        x = x.astype(np.float32) / 255.0
        trainer = Trainer(cfg, model, params, mask, steps_per_epoch=4)
        trainer.train_one_epoch(batch_iterator(x, y, 8), epoch=0)
        d = str(tmp_path / "ckpt")
        trainer.save(d, epoch=0)

        trainer2 = Trainer(cfg, model, params, mask, steps_per_epoch=4)
        resumed = trainer2.maybe_resume(d)
        assert resumed == 0
        a = jax.tree_util.tree_leaves(trainer.state.trainable)
        b = jax.tree_util.tree_leaves(trainer2.state.trainable)
        for u, v in zip(a, b):
            np.testing.assert_allclose(u, v)

    def test_mixup_path_runs(self):
        cfg = make_cfg(**{"AUG.MIXUP": 0.2, "AUG.MIXCUT": 1.0,
                          "LOSS.LOSS": "soft_target"})
        model, params, mask = setup(cfg)
        x, y = synthetic_dataset(4, 8, 16)
        x = x.astype(np.float32) / 255.0
        trainer = Trainer(cfg, model, params, mask, steps_per_epoch=4)
        stats = trainer.train_one_epoch(batch_iterator(x, y, 8), epoch=0)
        assert np.isfinite(stats["loss"])

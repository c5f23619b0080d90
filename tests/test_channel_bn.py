"""channel_bn through the sweep engine.

The reference's few-shot Classifier routes the pooled feature through
``channel_bn = BatchNorm1d(affine=False)`` in every driver
(full_model_finetune.py:98-101, adapter_tuning_clip.py:124-130,
linear_classifier.py:38-55): batch statistics while training, running
statistics at eval.  These tests pin the TPU wiring — the batch_stats
collection threads through the vmapped sweep cells, train_final's state
carries the learned running stats, and dataset padding cycles real rows
so BN statistics aren't skewed by repeats of row 0.

(FeatureBatchNorm's torch-exact blending is pinned separately against
the executed reference in tests/test_refexec_engine.py.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.engine import (
    SweepEngine,
    ce_per_example,
    make_array_task,
)
from peft_vit_tpu.engine.train import pad_dataset
from peft_vit_tpu.models.classifier import ClassifierHead
from peft_vit_tpu.peft import build_mask, split_params


class TinyBN(nn.Module):
    classes: int

    @nn.compact
    def __call__(self, x, train=False):
        return ClassifierHead(
            self.classes, use_bn=True, name="classifier"
        )(x.reshape((x.shape[0], -1)), train=train)


def make_bn_engine(classes=3, dim=6, batch=8):
    cfg = get_default_config()
    cfg.TRAIN.BATCH_SIZE_PER_GPU = batch
    cfg.TRAIN.SCHEDULE = []
    cfg.TRAIN.SEARCH_WD_POINTS = 9
    cfg.TRAIN.SEARCH_WD_INIT_POINTS = 3
    model = TinyBN(classes)
    x0 = jnp.zeros((1, dim))
    variables = model.init(jax.random.PRNGKey(0), x0)
    params = variables["params"]
    assert "batch_stats" in variables  # channel_bn state exists
    mask = build_mask(params, "linear", num_layers=0)
    _, frozen = split_params(params, mask)

    def init_trainable(rng):
        t, _ = split_params(model.init(rng, x0)["params"], mask)
        return t

    apply_fn = lambda v, x, train, **kw: model.apply(v, x, train, **kw)
    engine = SweepEngine(
        cfg,
        apply_fn,
        init_trainable,
        frozen,
        ce_per_example,
        bn_template=variables["batch_stats"],
    )
    return engine, variables["batch_stats"]


def _task(n=48, dim=6, classes=3, seed=0, batch=8):
    rng = np.random.RandomState(seed)
    y = rng.randint(0, classes, n)
    # shift features far from zero so BN standardization is material
    x = (
        np.eye(classes)[y] @ rng.randn(classes, dim)
        + 5.0
        + 0.1 * rng.randn(n, dim)
    ).astype(np.float32)
    half = n * 2 // 3
    return make_array_task(x[:half], y[:half], x[half:], y[half:], batch)


class TestSweepWithChannelBN:
    def test_vmapped_cells_train_and_learn(self):
        engine, _ = make_bn_engine()
        task = _task()
        scores = engine.train_cells([0.5, 1e-6], [1e-4, 1e-4], task, 8)
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()
        assert scores[0] > 80.0

    def test_final_state_carries_updated_running_stats(self):
        engine, template = make_bn_engine()
        task = _task()
        state, _ = engine.train_final(0.5, 1e-4, task, 8)
        # running stats moved off the (0, 1) init toward the data
        m0 = template["classifier"]["channel_bn"]["bn_mean"]
        m1 = state.bn["classifier"]["channel_bn"]["bn_mean"]
        assert not np.allclose(np.asarray(m0), np.asarray(m1))
        # features sit near +5, so the learned running mean must too
        assert np.asarray(m1).mean() > 2.0
        # eval consumes the RUNNING stats: swapping in the fresh template
        # changes the logits (torch model.eval() semantics)
        got = engine._eval_one(state.trainable, engine.frozen, task.x_val, state.bn)
        fresh = engine._eval_one(
            state.trainable, engine.frozen, task.x_val, template
        )
        assert not np.allclose(np.asarray(got), np.asarray(fresh), atol=1e-3)

    def test_sweep_e2e(self):
        engine, _ = make_bn_engine()
        task = _task()
        lr, wd, score = engine.sweep(task, end_epoch=4, lr_grid=[0.5])
        assert np.isfinite(score) and score > 70.0


class TestCycledPadding:
    def test_pad_rows_cycle_the_dataset(self):
        x = np.arange(5, dtype=np.float32)[:, None]
        y = np.arange(5)
        xp, yp, valid = pad_dataset(x, y, 8)
        assert xp.shape[0] == 8 and valid.sum() == 5
        # rows 5..7 are rows 0..2 again, not three copies of row 0
        np.testing.assert_array_equal(xp[5:, 0], [0.0, 1.0, 2.0])
        np.testing.assert_array_equal(yp[5:], [0, 1, 2])
        assert not valid[5:].any()

    def test_exact_multiple_untouched(self):
        x = np.zeros((8, 2), np.float32)
        y = np.zeros(8, np.int64)
        xp, yp, valid = pad_dataset(x, y, 4)
        assert xp.shape[0] == 8 and valid.all()


class TestDriverWiring:
    def test_factory_builds_channel_bn_when_asked(self):
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import PEFTSpec

        cfg = get_default_config()
        cfg.DATASET.NUM_CLASSES = 4
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.MODEL.NAME = "clip_tiny"
        cfg.MODEL.SPEC.EMBED_DIM = 32
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
        cfg.MODEL.SPEC.VISION.WIDTH = 32
        cfg.MODEL.SPEC.VISION.LAYERS = 2
        cfg.MODEL.SPEC.VISION.HEADS = 2
        model, variables, _ = build_image_classifier(
            cfg, PEFTSpec(), 4, use_bn=True
        )
        bs = variables.get("batch_stats") or {}
        assert "channel_bn" in bs.get("classifier", {})
        # default stays off for the full-shot trainer path
        model2, variables2, _ = build_image_classifier(cfg, PEFTSpec(), 4)
        bs2 = variables2.get("batch_stats") or {}
        assert "channel_bn" not in bs2.get("classifier", {})

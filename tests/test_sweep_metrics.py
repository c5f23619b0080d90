"""Metric-aware sweep scoring.

The reference validates every sweep cell with the dataset's metric
(adapter_tuning_clip.py:338-377 -> evaluation/metric.py:36-47): top-1 for
most datasets, mean-per-class for caltech-style sets, 11-pt mAP / roc_auc
for the multilabel sets.  These tests pin that behavior and the (B, C)
one-hot/multilabel target path that used to crash masked_accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.engine import (
    SweepEngine,
    bce_per_example,
    ce_per_example,
    make_array_task,
)
from peft_vit_tpu.engine.metrics import (
    average_precision_11point_np,
    balanced_accuracy_np,
    metric_for_dataset,
)
from peft_vit_tpu.peft import build_mask, split_params


class Tiny(nn.Module):
    classes: int

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(self.classes, name="classifier")(
            x.reshape((x.shape[0], -1))
        )


def make_engine(metric, classes, dim, criterion):
    cfg = get_default_config()
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TRAIN.SCHEDULE = []
    cfg.TRAIN.SEARCH_WD_POINTS = 9
    cfg.TRAIN.SEARCH_WD_INIT_POINTS = 3
    model = Tiny(classes)
    x0 = jnp.zeros((1, dim))
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    mask = build_mask(params, "linear", num_layers=0)
    _, frozen = split_params(params, mask)

    def init_trainable(rng):
        t, _ = split_params(
            model.init(rng, x0)["params"], mask
        )
        return t

    apply_fn = lambda v, x, train: model.apply(v, x, train)
    engine = SweepEngine(
        cfg, apply_fn, init_trainable, frozen, criterion, metric=metric
    )
    return cfg, engine


def _multilabel_task(n=64, dim=12, classes=4, seed=0, batch=8):
    rng = np.random.RandomState(seed)
    y = (rng.rand(n, classes) < 0.35).astype(np.int64)
    y[np.arange(n), rng.randint(0, classes, n)] = 1
    w = rng.randn(classes, dim)
    x = (y @ w + 0.1 * rng.randn(n, dim)).astype(np.float32)
    half = n // 2
    return make_array_task(x[:half], y[:half], x[half:], y[half:], batch)


class TestMultilabelSweep:
    def test_train_cells_no_crash_and_learns(self):
        _, engine = make_engine("11point_mAP", 4, 12, bce_per_example)
        task = _multilabel_task()
        scores = engine.train_cells([0.5, 1e-6], [1e-4, 1e-4], task, 8)
        assert scores.shape == (2,)
        assert np.isfinite(scores).all()
        assert 0.0 <= scores.min() and scores.max() <= 100.0
        # the real lr must separate the labels nearly perfectly
        assert scores[0] > 90.0

    def test_train_final_scores_with_map(self):
        _, engine = make_engine("11point_mAP", 4, 12, bce_per_example)
        task = _multilabel_task()
        state, best = engine.train_final(0.5, 1e-4, task, 8)
        logits = engine._eval_one(state.trainable, engine.frozen, task.x_val)
        v = np.asarray(task.valid_val)
        expect = average_precision_11point_np(
            np.asarray(logits, np.float32)[v], np.asarray(task.y_val)[v]
        )
        got = engine._score_one(logits, task.y_val, task.valid_val)
        assert got == pytest.approx(expect)
        assert best >= got or best == pytest.approx(got)


class TestMeanPerClassSweep:
    def test_caltech_style_metric_resolution(self):
        assert metric_for_dataset("caltech-101") == "mean-per-class"
        assert metric_for_dataset("voc-2007-classification") == "11point_mAP"
        assert metric_for_dataset("chestx-ray8") == "roc_auc"
        assert metric_for_dataset("synthetic_multilabel") == "11point_mAP"
        assert metric_for_dataset("cifar-10") == "accuracy"

    def test_score_cells_is_balanced_accuracy(self):
        _, engine = make_engine("mean-per-class", 3, 6, ce_per_example)
        rng = np.random.RandomState(1)
        # imbalanced val set: top-1 and mean-per-class disagree
        y = np.array([0] * 12 + [1] * 3 + [2] * 1)
        logits = rng.randn(2, len(y), 3).astype(np.float32)
        valid = np.ones(len(y), bool)
        got = engine._score_cells(
            jnp.asarray(logits), jnp.asarray(y), jnp.asarray(valid)
        )
        for i in range(2):
            assert got[i] == pytest.approx(
                balanced_accuracy_np(logits[i], y)
            )

    def test_sweep_runs_on_mean_per_class(self):
        cfg, engine = make_engine("mean-per-class", 3, 6, ce_per_example)
        rng = np.random.RandomState(0)
        y = rng.randint(0, 3, 48)
        x = (np.eye(3)[y] @ rng.randn(3, 6) + 0.1 * rng.randn(48, 6)).astype(
            np.float32
        )
        task = make_array_task(x[:32], y[:32], x[32:], y[32:], 8)
        lr, wd, score = engine.sweep(task, end_epoch=4, lr_grid=[0.5])
        assert np.isfinite(score) and score > 60.0
        assert wd > 0.0

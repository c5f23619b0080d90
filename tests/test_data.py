"""Data pipeline tests: few-shot sampling and balanced split semantics
(reference feature.py:74-169, 580-583)."""

import numpy as np
import pytest

from peft_vit_tpu.data import (
    balanced_val_split,
    effective_shots,
    sample_few_shot_subset,
    synthetic_dataset,
    load_tsv,
)
from peft_vit_tpu.data.pipeline import construct_splits, merge_trainval
from peft_vit_tpu.config import get_default_config


class TestFewShotSampler:
    def test_k_per_class(self):
        labels = np.repeat(np.arange(5), 20)
        idx = sample_few_shot_subset(labels, 3, seed=0)
        counts = np.bincount(labels[idx], minlength=5)
        assert (counts == 3).all()

    def test_seeded_deterministic(self):
        labels = np.repeat(np.arange(4), 10)
        a = sample_few_shot_subset(labels, 2, seed=7)
        b = sample_few_shot_subset(labels, 2, seed=7)
        c = sample_few_shot_subset(labels, 2, seed=8)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_k_exceeds_class_size(self):
        labels = np.asarray([0, 0, 1])
        idx = sample_few_shot_subset(labels, 5, seed=0)
        assert len(idx) == 3

    def test_multilabel_quota(self):
        labels = np.zeros((10, 3), np.int64)
        labels[:4, 0] = 1
        labels[4:8, 1] = 1
        labels[8:, 2] = 1
        idx = sample_few_shot_subset(labels, 2, seed=0)
        picked = labels[idx]
        assert (picked.sum(0) >= np.minimum(2, labels.sum(0))).all()

    def test_one_shot_promotion(self):
        assert effective_shots(1, "cifar-10") == 2
        assert effective_shots(5, "cifar-10") == 5
        assert effective_shots(10000, "patch-camelyon") == 10000


class TestBalancedSplit:
    def test_ratio_per_class(self):
        labels = np.repeat(np.arange(3), 10)
        tr, va = balanced_val_split(labels, 0.2)
        assert len(va) == 6  # ceil(10*0.2)=2 per class
        counts = np.bincount(labels[va], minlength=3)
        assert (counts == 2).all()
        assert set(tr) | set(va) == set(range(30))
        assert not set(tr) & set(va)

    def test_deterministic_first_indices(self):
        """Reference takes the FIRST n indices per class, not random
        (feature.py:120 comment)."""
        labels = np.asarray([0, 1, 0, 1, 0, 1, 0, 1, 0, 1])
        tr, va = balanced_val_split(labels, 0.2)
        # first occurrence of each class goes to val
        assert 0 in va and 1 in va

    def test_multilabel_split(self):
        rng = np.random.RandomState(0)
        labels = (rng.rand(50, 4) < 0.3).astype(np.int64)
        labels[labels.sum(1) == 0, 0] = 1
        tr, va = balanced_val_split(labels, 0.2)
        assert len(tr) + len(va) == 50
        # every class with >=1 positive is represented in val
        assert (labels[va].sum(0) > 0).all()


class TestSynthetic:
    def test_shapes_and_determinism(self):
        x, y = synthetic_dataset(num_classes=4, n_per_class=5, image_size=16)
        x2, y2 = synthetic_dataset(
            num_classes=4, n_per_class=5, image_size=16
        )
        assert x.shape == (20, 16, 16, 3) and x.dtype == np.uint8
        np.testing.assert_array_equal(x, x2)

    def test_construct_splits_fewshot(self):
        cfg = get_default_config()
        cfg.DATASET.DATASET = "synthetic"
        cfg.DATASET.NUM_CLASSES = 4
        cfg.DATASET.NUM_SAMPLES_PER_CLASS = 5
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        s = construct_splits(cfg)
        assert s.num_classes == 4
        # 5-shot * 4 classes = 20, split 80/20
        assert len(s.y_train) == 16 and len(s.y_val) == 4
        xt, yt = merge_trainval(s)
        assert len(yt) == 20
        assert s.x_train.dtype == np.float32  # normalized


class TestTSV:
    def test_roundtrip(self, tmp_path):
        import base64
        import io

        from PIL import Image

        p = tmp_path / "shard.tsv"
        rows = []
        for i in range(4):
            img = Image.fromarray(
                np.full((8, 8, 3), i * 40, np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            rows.append(f"img{i}\t{b64}\t{i % 2}")
        p.write_text("\n".join(rows) + "\n")
        x, y = load_tsv(str(p), image_size=8)
        assert x.shape == (4, 8, 8, 3)
        np.testing.assert_array_equal(y, [0, 1, 0, 1])

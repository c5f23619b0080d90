"""Device-side timm-aug suite (data/augment.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.data.augment import (
    _autocontrast,
    _equalize,
    _invert,
    _posterize,
    _rotate,
    _solarize,
    _translate_x,
    make_train_transform,
    rand_augment,
    random_erasing,
)


def _img(h=16, w=16, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randint(0, 255, (h, w, 3)),
        jnp.float32,
    )


class TestOps:
    def test_invert(self):
        x = _img()
        np.testing.assert_allclose(_invert(x, 5.0), 255.0 - x)

    def test_autocontrast_full_range(self):
        x = _img() * 0.25 + 100.0  # squashed range
        out = _autocontrast(x, 0.0)
        assert float(out.min()) == pytest.approx(0.0, abs=1e-3)
        assert float(out.max()) == pytest.approx(255.0, abs=1e-3)

    def test_equalize_flattens(self):
        x = _img()
        out = _equalize(x, 0.0)
        assert out.shape == x.shape
        assert float(out.max()) <= 255.0 and float(out.min()) >= 0.0
        # equalized histogram spreads further than a squashed input's
        squashed = x * 0.2
        spread = float(_equalize(squashed, 0).std())
        assert spread > float(squashed.std())

    def test_posterize_quantizes(self):
        x = _img()
        out = _posterize(x, 10.0)  # max magnitude -> ~0 bits kept
        assert len(np.unique(np.asarray(out))) <= 3

    def test_solarize(self):
        x = _img()
        out = _solarize(x, 10.0)  # threshold 0 -> full inversion
        np.testing.assert_allclose(out, 255.0 - x)

    def test_rotate_zero_is_identity(self):
        x = _img()
        np.testing.assert_allclose(
            np.asarray(_rotate(x, 0.0)), np.asarray(x), atol=1e-3
        )

    def test_translate_moves_and_fills(self):
        x = jnp.zeros((8, 8, 3)) + 200.0
        out = _translate_x(x, 10.0)  # 0.45 * 8 = 3.6 px
        # inverse mapping: the right edge samples outside -> grey fill
        assert float(out[0, -1, 0]) == pytest.approx(128.0)
        assert float(out[0, 0, 0]) == pytest.approx(200.0)


class TestRandAugment:
    def test_batch_shapes_and_range(self):
        rng = jax.random.PRNGKey(0)
        batch = jnp.stack([_img(seed=i) for i in range(4)])
        out = jax.jit(rand_augment)(rng, batch)
        assert out.shape == batch.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0

    def test_deterministic_in_key(self):
        batch = jnp.stack([_img(seed=i) for i in range(2)])
        a = rand_augment(jax.random.PRNGKey(1), batch)
        b = rand_augment(jax.random.PRNGKey(1), batch)
        c = rand_augment(jax.random.PRNGKey(2), batch)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_random_erasing_prob(self):
        batch = jnp.stack([_img(seed=i) for i in range(8)])
        none = random_erasing(jax.random.PRNGKey(0), batch, prob=0.0)
        np.testing.assert_allclose(np.asarray(none), np.asarray(batch))
        allof = random_erasing(jax.random.PRNGKey(0), batch, prob=1.0)
        changed = [
            not np.allclose(np.asarray(allof[i]), np.asarray(batch[i]))
            for i in range(8)
        ]
        assert all(changed)


class TestTransformIntegration:
    def _cfg(self, enabled=True):
        from peft_vit_tpu.config import get_default_config

        cfg = get_default_config()
        cfg.AUG.TIMM_AUG.USE_TRANSFORM = enabled
        cfg.AUG.TIMM_AUG.AUTO_AUGMENT = "rand-m9-mstd0.5-inc1"
        cfg.AUG.TIMM_AUG.RE_PROB = 0.25
        return cfg

    def test_disabled_returns_none(self):
        assert make_train_transform(self._cfg(False)) is None

    def test_transform_normalizes(self):
        cfg = self._cfg()
        t = make_train_transform(cfg)
        batch = jnp.stack([_img(seed=i) for i in range(2)])
        out = t(jax.random.PRNGKey(0), batch)
        assert abs(float(out.mean())) < 3.0  # normalized scale

    def test_trainer_runs_with_device_aug(self):
        from peft_vit_tpu.data import synthetic_dataset
        from peft_vit_tpu.engine.trainer import Trainer, batch_iterator
        from peft_vit_tpu.models import ImageClassifier, VisionTransformer
        from peft_vit_tpu.peft import PEFTSpec, build_mask

        cfg = self._cfg()
        cfg.DATASET.DATASET = "synthetic"
        cfg.MODEL.NUM_CLASSES = 4
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
        cfg.TRAIN.END_EPOCH = 1
        vit = VisionTransformer(
            image_size=16, patch_size=8, width=32, layers=2, heads=2,
            style="timm", spec=PEFTSpec(), use_flash=False,
        )
        model = ImageClassifier(backbone=vit, num_classes=4)
        x0 = jnp.zeros((1, 16, 16, 3))
        params = model.init(jax.random.PRNGKey(0), x0)["params"]
        mask = build_mask(params, "full", num_layers=2)
        trainer = Trainer(cfg, model, params, mask, steps_per_epoch=4)
        assert trainer.train_transform is not None
        x, y = synthetic_dataset(4, 8, 16)  # RAW uint8
        stats = trainer.train_one_epoch(
            batch_iterator(x, y, 8, seed=0), epoch=0
        )
        assert np.isfinite(stats["loss"])
        acc = trainer.evaluate(batch_iterator(x, y, 8, shuffle=False))
        assert 0.0 <= acc <= 100.0

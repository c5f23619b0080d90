"""DropBlock + DyReLU: the last CNN-support layers from the reference
(lib/layers/dropblock.py, lib/layers/dy_relu.py; wired by cls_resnet.py
:409-419 and cls_resnetD.py).

The DyReLU numerics and the cls_resnetD 'd' block topology are pinned
end-to-end against the EXECUTED reference in
tests/test_refexec_models.py::TestResNetDRefexec.  Here:

* exact-noise parity: run the reference DropBlock with a fixed noise
  tensor and our drop_block with the SAME noise — gamma, valid-center
  grid, block expansion and renormalization must agree elementwise.
* mask statistics, the linear keep-prob anneal, the per-stage targets.
* the full-shot Trainer runs a DropBlock ResNet end-to-end (progress +
  'dropblock' rng threading through the jitted step).
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.ops.dropblock import (
    drop_block,
    scheduled_keep_prob,
    stage_keep_prob,
)

REF_DB = "/root/reference/full_shot/main/lib/layers/dropblock.py"


def _load_reference_dropblock():
    spec = importlib.util.spec_from_file_location("_ref_dropblock", REF_DB)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_dropblock"] = mod
    spec.loader.exec_module(mod)
    return mod


class TestDropBlockOp:
    def test_keep_prob_one_is_identity(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)))
        out = drop_block(
            x, jax.random.PRNGKey(1), block_size=3, keep_prob=1.0
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)

    def test_exact_parity_with_reference_under_shared_noise(self, monkeypatch):
        """Reference dropblock.py:28-75 with torch.rand pinned to a fixed
        noise tensor vs our drop_block with jax.random.uniform pinned to
        the SAME noise: outputs must match elementwise (gamma formula,
        valid-center grid, min-pool block expansion, numel/sum rescale).
        The reference's `.cuda()` (dropblock.py:60) is stubbed to a no-op
        — it is the only CUDA dependency in the module."""
        torch = pytest.importorskip("torch")
        ref = _load_reference_dropblock()

        n, c, h, w = 2, 3, 12, 12
        bs, kp = 3, 0.8
        noise = np.random.default_rng(7).uniform(size=(n, c, h, w)).astype(
            np.float32
        )
        x = np.random.default_rng(8).normal(size=(n, c, h, w)).astype(
            np.float32
        )

        monkeypatch.setattr(
            torch, "rand", lambda *s, **k: torch.from_numpy(noise)
        )
        monkeypatch.setattr(
            torch.Tensor, "cuda", lambda self, *a, **k: self
        )
        # current_step=1, train_steps=1 -> effective keep prob == kp
        m = ref.DropBlock(block_size=bs, keep_prob=kp, current_step=1.0,
                          train_steps=1.0)
        m.train()
        with torch.no_grad():
            ref_out = m(torch.from_numpy(x)).numpy()

        import peft_vit_tpu.ops.dropblock as db_mod

        noise_nhwc = jnp.asarray(noise.transpose(0, 2, 3, 1))
        monkeypatch.setattr(
            db_mod.jax.random,
            "uniform",
            lambda rng, shape, dtype=jnp.float32: noise_nhwc,
        )
        ours = drop_block(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jax.random.PRNGKey(0),
            block_size=bs,
            keep_prob=kp,
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref_out,
            rtol=1e-5, atol=1e-6,
        )

    def test_whole_map_branch_parity(self, monkeypatch):
        """block_size == W takes the reference's min-over-map branch
        (dropblock.py:62-66): any dropped valid center zeroes the whole
        (n, c) map."""
        torch = pytest.importorskip("torch")
        ref = _load_reference_dropblock()
        n, c, h, w = 2, 2, 5, 5
        noise = np.random.default_rng(3).uniform(size=(n, c, h, w)).astype(
            np.float32
        )
        x = np.ones((n, c, h, w), np.float32)
        monkeypatch.setattr(
            torch, "rand", lambda *s, **k: torch.from_numpy(noise)
        )
        monkeypatch.setattr(
            torch.Tensor, "cuda", lambda self, *a, **k: self
        )
        # keep_prob 0.5 -> gamma 0.5: with this seed one of the four
        # (n, c) maps drops, the rest survive (with ALL maps dropped the
        # reference divides by zero and returns NaN — dropblock.py:75;
        # our sum-clip returns zeros instead, checked below)
        m = ref.DropBlock(block_size=5, keep_prob=0.5, current_step=1.0,
                          train_steps=1.0)
        m.train()
        with torch.no_grad():
            ref_out = m(torch.from_numpy(x)).numpy()
        assert (ref_out == 0).all(axis=(2, 3)).any()  # a dropped map

        import peft_vit_tpu.ops.dropblock as db_mod

        noise_nhwc = jnp.asarray(noise.transpose(0, 2, 3, 1))
        monkeypatch.setattr(
            db_mod.jax.random,
            "uniform",
            lambda rng, shape, dtype=jnp.float32: noise_nhwc,
        )
        ours = drop_block(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jax.random.PRNGKey(0),
            block_size=5,
            keep_prob=0.5,
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref_out,
            rtol=1e-5, atol=1e-6,
        )
        # all-dropped: zeros, not the reference's 0/0 NaN
        all_drop = drop_block(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jax.random.PRNGKey(0),
            block_size=5,
            keep_prob=0.0,
        )
        assert np.all(np.asarray(all_drop) == 0.0)

    def test_drop_fraction_tracks_keep_prob(self):
        x = jnp.ones((4, 32, 32, 8))
        out = jax.jit(
            lambda r: drop_block(x, r, block_size=5, keep_prob=0.85)
        )(jax.random.PRNGKey(5))
        zeros = float(np.mean(np.asarray(out) == 0.0))
        # expected drop fraction ~ 1 - keep_prob (the gamma formula's
        # design target); loose band, it's a statistical property
        assert 0.05 < zeros < 0.30, zeros
        # renormalization keeps the activation mass
        kept = np.asarray(out)[np.asarray(out) != 0]
        assert abs(kept.mean() * (1 - zeros) - 1.0) < 0.05

    def test_schedule_and_stage_targets(self):
        # linear anneal (dropblock.py:29-30)
        assert float(scheduled_keep_prob(0.8, 0.0)) == 1.0
        assert abs(float(scheduled_keep_prob(0.8, 0.5)) - 0.9) < 1e-6
        assert abs(float(scheduled_keep_prob(0.8, 1.0)) - 0.8) < 1e-6
        # per-stage derivation (cls_resnet.py:415)
        assert abs(stage_keep_prob(0.9, 4) - 0.9) < 1e-9
        assert abs(stage_keep_prob(0.9, 3) - (1 - 0.1 / 4)) < 1e-9
        assert abs(stage_keep_prob(0.9, 1) - (1 - 0.1 / 64)) < 1e-9

    def test_requires_square(self):
        with pytest.raises(ValueError):
            drop_block(
                jnp.ones((1, 4, 6, 2)),
                jax.random.PRNGKey(0),
                block_size=3,
                keep_prob=0.9,
            )


class TestDropBlockTrainer:
    def test_full_shot_trainer_runs_dropblock_resnet(self):
        """AUG.DROPBLOCK_KEEP_PROB < 1 on a cls_resnet backbone: the
        jitted train step threads the 'dropblock' rng and the
        progress scalar; loss stays finite and BN stats update."""
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.data import synthetic_dataset
        from peft_vit_tpu.engine.trainer import Trainer, batch_iterator
        from peft_vit_tpu.models import ImageClassifier
        from peft_vit_tpu.models.factory import _build_resnet_backbone
        from peft_vit_tpu.peft import build_mask

        cfg = get_default_config()
        cfg.DATASET.NUM_CLASSES = 4
        cfg.MODEL.NUM_CLASSES = 4
        cfg.MODEL.NAME = "cls_resnet"
        cfg.MODEL.SPEC.VISION["LAYERS_PER_STAGE"] = [1, 1]
        cfg.MODEL.SPEC.VISION["STEM_WIDTH"] = 8
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.TRAIN.BATCH_SIZE_PER_GPU = 4
        cfg.TRAIN.END_EPOCH = 1
        cfg.TRAIN.LR = 0.01
        cfg.AUG.DROPBLOCK_KEEP_PROB = 0.8
        cfg.AUG.DROPBLOCK_LAYERS = [1, 2]
        cfg.AUG.DROPBLOCK_BLOCK_SIZE = 3

        backbone = _build_resnet_backbone(cfg, jnp.float32)
        assert backbone.dropblock_stages == (1, 2)
        model = ImageClassifier(backbone=backbone, num_classes=4)
        x0 = jnp.zeros((1, 16, 16, 3))
        variables = model.init(
            {"params": jax.random.PRNGKey(0)}, x0
        )
        params = variables["params"]
        mask = build_mask(params, "full", num_layers=0)
        trainer = Trainer(cfg, model, params, mask, steps_per_epoch=2,
                          batch_stats=variables.get("batch_stats"))
        x, y = synthetic_dataset(4, 16, 16)
        x = x.astype(np.float32) / 255.0
        stats = trainer.train_one_epoch(
            batch_iterator(x, y, 4, seed=0), epoch=0
        )
        assert np.isfinite(stats["loss"])

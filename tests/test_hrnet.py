"""HRNet backbone tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.models.hrnet import HRNet, _upsample_nearest


class TestHRNet:
    def test_upsample_nearest(self):
        x = jnp.arange(4.0).reshape(1, 2, 2, 1)
        y = _upsample_nearest(x, 2)
        assert y.shape == (1, 4, 4, 1)
        np.testing.assert_array_equal(
            np.asarray(y[0, :, :, 0]),
            [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
        )

    def test_forward_and_branches(self):
        m = HRNet(width=8, stage_modules=(1, 1, 1))
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 2048)
        assert bool(jnp.isfinite(out).all())
        from flax import traverse_util

        flat = traverse_util.flatten_dict(v["params"], sep="/")
        # stage 4 runs 4 branches with cross-resolution fusion
        assert any("stage4_module0/branch3_block0" in k for k in flat)
        assert any("stage4_module0/fuse/up_3_0" in k for k in flat)
        assert any("stage4_module0/fuse/down_0_3_2" in k for k in flat)

    def test_batch_stats_update_in_train_mode(self):
        m = HRNet(width=8, stage_modules=(1,))
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        _, upd = m.apply(v, x, False, mutable=["batch_stats"])
        assert jax.tree_util.tree_leaves(upd["batch_stats"])


class TestHRNetVFactory:
    """cls_hrnet_v2/v3/v4 built from the reference experiment-yaml config
    surface (MODEL.SPEC for v2, MODEL.EXTRA for v3/v4)."""

    def _cfg(self, name):
        from peft_vit_tpu.config import get_default_config

        cfg = get_default_config()
        cfg.defrost()
        cfg.MODEL.NAME = name
        cfg.DATASET.NUM_CLASSES = 4
        cfg.TRAIN.IMAGE_SIZE = [64, 64]
        return cfg

    def test_v4_from_extra(self):
        import jax

        from peft_vit_tpu.config.node import CfgNode as CN
        from peft_vit_tpu.models.factory import (
            _build_hrnet_backbone,
            is_hrnet_model,
        )

        cfg = self._cfg("cls_hrnet_v4")
        cfg.MODEL.EXTRA = CN(
            {
                "WITH_SE": True,
                "STEM_SPEC": "conv32s2maxpools2inv32e6x1",
                "STAGES_SPEC": CN(
                    {
                        "NUM_STAGES": 2,
                        "NUM_MODULES": [1, 1],
                        "NUM_BRANCHES": [2, 3],
                        "NUM_BLOCKS": [[2, 2], [2, 2, 2]],
                        "NUM_CHANNELS": [[8, 16], [8, 16, 32]],
                        "BLOCK": ["INVERTED", "INVERTED"],
                        "FUSE_METHOD": ["SUM", "SUM"],
                    },
                    new_allowed=True,
                ),
                "HEAD_SPEC": CN(
                    {
                        "BLOCK": ["INVERTED"] * 3,
                        "NUM_CHANNELS": [16, 32, 64],
                        "NUM_CHANNELS_PROJ": 128,
                    },
                    new_allowed=True,
                ),
            },
            new_allowed=True,
        )
        assert is_hrnet_model(cfg)
        m = _build_hrnet_backbone(cfg, jnp.float32)
        x = jnp.ones((2, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 128)
        assert bool(jnp.isfinite(out).all())

    def test_v2_from_spec(self):
        import jax

        from peft_vit_tpu.config.node import CfgNode as CN
        from peft_vit_tpu.models.factory import _build_hrnet_backbone

        cfg = self._cfg("cls_hrnet_v2")
        cfg.MODEL.SPEC.WITH_SE = True
        cfg.MODEL.SPEC.STAGES = CN(
            {
                "NUM_STAGES": 2,
                "NUM_MODULES": [1, 1],
                "NUM_BRANCHES": [2, 3],
                "NUM_BLOCKS": [[2, 2], [2, 2, 2]],
                "NUM_CHANNELS": [[8, 16], [9, 18, 36]],
                "BLOCK": ["BASIC", "BASIC"],
                "FUSE_METHOD": ["SUM", "SUM"],
            },
            new_allowed=True,
        )
        cfg.MODEL.SPEC.HEAD = CN(
            {
                "BLOCK": ["BOTTLENECK"] * 3,
                "NUM_CHANNELS": [8, 16, 32],
                "NUM_CHANNELS_PROJ": 64,
            },
            new_allowed=True,
        )
        m = _build_hrnet_backbone(cfg, jnp.float32)
        x = jnp.ones((2, 64, 64, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 64)
        assert bool(jnp.isfinite(out).all())

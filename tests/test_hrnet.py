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

"""ReXNet backbone tests."""

import jax
import jax.numpy as jnp
import numpy as np

from peft_vit_tpu.models.rexnet import (
    LinearBottleneck,
    ReXNet,
    _rexnet_channels,
)


class TestReXNet:
    def test_channel_recipe(self):
        cfg = _rexnet_channels(1.0, 1.0)
        assert len(cfg) == 16  # 1+2+2+3+3+5
        outs = [c[1] for c in cfg]
        assert outs == sorted(outs)  # channels grow monotonically
        assert cfg[0][3] == 1.0 and cfg[1][3] == 6.0  # expand ratios

    def test_partial_residual(self):
        """Stride-1 blocks add the input onto the first in_ch channels."""
        m = LinearBottleneck(in_ch=8, out_ch=16, stride=1, use_se=False)
        x = jnp.ones((1, 4, 4, 8)) * 3.0
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        # zero all conv kernels: output == partial residual exactly
        from flax import traverse_util

        flat = traverse_util.flatten_dict(v["params"], sep="/")
        for k in flat:
            if k.endswith("kernel"):
                flat[k] = jnp.zeros_like(flat[k])
        v0 = {
            "params": traverse_util.unflatten_dict(flat, sep="/"),
            "batch_stats": v["batch_stats"],
        }
        out0 = m.apply(v0, x)
        np.testing.assert_allclose(np.asarray(out0[..., :8]), 3.0)
        np.testing.assert_allclose(np.asarray(out0[..., 8:]), 0.0)

    def test_forward(self):
        # depth_mult shrinks to 7 blocks; CPU conv compiles are slow
        m = ReXNet(width_mult=0.5, depth_mult=0.3)
        x = jnp.ones((2, 32, 32, 3))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 640)  # head = 1280*0.5
        assert bool(jnp.isfinite(out).all())

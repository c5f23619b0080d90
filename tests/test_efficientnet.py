"""EfficientNet backbone (models/efficientnet.py) + timm converter.

The golden fixture (tests/golden/effnet_tower.npz) is a tiny two-stage
EfficientNet in timm state-dict naming with the output of an independent
torch re-implementation — it pins both timm block layouts (depthwise-
separable and inverted-residual), the SE reduce convention, BN eps 1e-3,
and the converter key mapping.  The reference consumes efficientnet_b0
through timm.create_model + EvalModel (feature.py:227-231).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.models.efficientnet import (
    B0_BLOCKS,
    EfficientNet,
    round_channels,
)
from peft_vit_tpu.models.convert import (
    graft,
    timm_effnet_state_dict_to_tree,
)

GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden"
)


class TestGolden:
    def test_forward_parity_with_timm_layout(self):
        g = np.load(os.path.join(GOLDEN, "effnet_tower.npz"))
        sd = {
            k.replace("__", "."): g[k]
            for k in g.files
            if k not in ("x", "out", "image")
        }
        flat, stats = timm_effnet_state_dict_to_tree(sd)
        m = EfficientNet(
            blocks=((1, 8, 1, 3, 1), (6, 16, 2, 3, 2)),
            stem_ch=8,
            head_ch=24,
        )
        x = jnp.asarray(g["x"].transpose(0, 2, 3, 1))
        variables = m.init(jax.random.PRNGKey(0), x)
        params, missing = graft(
            dict(variables["params"]), flat, strict=True
        )
        assert not missing, missing
        bstats, _ = graft(
            dict(variables["batch_stats"]), stats, strict=True
        )
        out = m.apply(
            {"params": params, "batch_stats": bstats}, x, True
        )
        np.testing.assert_allclose(
            np.asarray(out), g["out"], rtol=1e-4, atol=1e-5
        )


class TestB0:
    def test_round_channels(self):
        # timm invariants: B0 identity; B1 width 1.0; B2 width 1.1
        assert round_channels(32, 1.0) == 32
        assert round_channels(320, 1.2) == 384
        assert round_channels(16, 1.1) == 16

    def test_b0_shape_and_param_count(self):
        m = EfficientNet()
        x = jnp.zeros((1, 224, 224, 3), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        feats = m.apply(variables, x, True)
        assert feats.shape == (1, 1280)
        n = sum(
            p.size
            for p in jax.tree_util.tree_leaves(variables["params"])
        )
        # timm efficientnet_b0 without its classifier: ~4.0M
        assert 3.8e6 < n < 4.2e6, n

    def test_b0_stage_layout_matches_timm(self):
        # 16 blocks in 7 stages (1,2,2,3,3,4,1)
        m = EfficientNet()
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        blocks = [k for k in params if k.startswith("blocks_")]
        assert len(blocks) == 16
        for s, n in enumerate((1, 2, 2, 3, 3, 4, 1)):
            got = len(
                [k for k in blocks if k.startswith(f"blocks_{s}_")]
            )
            assert got == n, (s, got, n)


class TestFactory:
    def test_config_build(self):
        from peft_vit_tpu.models.factory import (
            build_image_classifier,
            is_efficientnet_model,
        )
        from peft_vit_tpu.peft import spec_from_config

        cfg = get_default_config()
        cfg.DATASET.NUM_CLASSES = 5
        cfg.TRAIN.IMAGE_SIZE = [32, 32]
        cfg.MODEL.NAME = "efficientnet_b0"
        assert is_efficientnet_model(cfg)
        model, variables, encode_text = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        assert encode_text is None
        assert "batch_stats" in variables
        logits = model.apply(
            variables, jnp.zeros((2, 32, 32, 3), jnp.float32), False
        )
        assert logits.shape == (2, 5)

"""TTNet v2/v3 pinned against the EXECUTED reference
(tests/golden/generate_ttnet_from_reference.py; VERDICT r3 #6 — the
last reference model code unported).

cls_ttnet_v2's shipped ``get_cls_model`` raises NameError (no ``import
os``, cls_ttnet_v2.py:289) — the generator proves that by execution;
these tests pin the model CLASS forward, which runs fine.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.models.convert import graft, ttnet_state_dict_to_tree
from peft_vit_tpu.models.ttnet import (
    TTNetV2,
    TTNetV3,
    channel_shuffle,
    channel_unshuffle,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _sd(g):
    return {
        k[len("sd__"):].replace("__", "."): g[k]
        for k in g.files
        if k.startswith("sd__")
    }


class TestChannelShuffle:
    def test_matches_torch_semantics(self):
        """Pin the NHWC permutation against the reference's NCHW view
        math (cls_ttnet_v2.py:25-40) computed directly in numpy."""
        b, h, w, c, groups, mini = 2, 3, 3, 32, 2, 4
        x = np.arange(b * h * w * c, dtype=np.float32).reshape(b, h, w, c)
        got = np.asarray(channel_shuffle(jnp.asarray(x), groups, mini))
        # torch: (B,C,H,W) -> view(B, g, mn, ms, H, W) -> transpose(1,2)
        xt = x.transpose(0, 3, 1, 2)
        cpg = c // groups
        mn = cpg // mini
        want = (
            xt.reshape(b, groups, mn, mini, h, w)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(b, c, h, w)
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_array_equal(got, want)

    def test_unshuffle_inverts(self):
        x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 2, 64))
        y = channel_unshuffle(channel_shuffle(x, 2), 2)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


class TestTTNetV2Refexec:
    def test_end_to_end(self):
        g = np.load(os.path.join(GOLDEN, "refexec_ttnet_v2.npz"))
        sd = _sd(g)
        model = TTNetV2(num_classes=1000)
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        flat, stats = ttnet_state_dict_to_tree(sd)
        params, missing = graft(variables["params"], flat)
        assert not missing, missing
        bstats, bmissing = graft(variables["batch_stats"], stats)
        assert not bmissing, bmissing
        y = model.apply(
            {"params": params, "batch_stats": bstats}, x, True
        )
        np.testing.assert_allclose(
            np.asarray(y), g["y"], rtol=1e-4, atol=1e-4
        )


class TestTTNetV3Refexec:
    def test_end_to_end(self):
        g = np.load(os.path.join(GOLDEN, "refexec_ttnet_v3.npz"))
        sd = _sd(g)
        model = TTNetV3(
            num_classes=7,
            stem_kickoff=8, stem_start=16, stem_expand=2, stem_kernel=3,
            stage_channels=(32, 64), stage_repeats=(2, 3),
            stage_kernels=(3, 5), channel_final=128,
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        flat, stats = ttnet_state_dict_to_tree(sd)
        params, missing = graft(variables["params"], flat)
        assert not missing, missing
        bstats, bmissing = graft(variables["batch_stats"], stats)
        assert not bmissing, bmissing
        y = model.apply(
            {"params": params, "batch_stats": bstats}, x, True
        )
        np.testing.assert_allclose(
            np.asarray(y), g["y"], rtol=1e-4, atol=1e-4
        )


class TestFactory:
    def test_build_from_config(self):
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import spec_from_config

        cfg = get_default_config()
        cfg.MODEL.NAME = "cls_ttnet_v3"
        cfg.TRAIN.IMAGE_SIZE = [64, 64]
        cfg.MODEL.EXTRA = type(cfg.MODEL)(
            {
                "STEM": type(cfg.MODEL)(
                    {
                        "NUM_CHANNEL_KICKOFF": 8,
                        "NUM_CHANNEL_STEM_START": 16,
                        "EXPAND_STEM_START": 2,
                        "KERNEL_SIZE": 3,
                    }
                ),
                "STAGES": type(cfg.MODEL)(
                    {
                        "NUM_CHANNEL_OUTPUT": [32, 64],
                        "NUM_BLOCK_REPEATS": [2, 2],
                        "KERNEL_SIZE": [3, 3],
                    }
                ),
                "NUM_CHANNEL_FINAL": 128,
            }
        )
        model, variables, _ = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        x = jnp.zeros((2, 64, 64, 3))
        out = model.apply(variables, x, False)
        assert out.shape == (2, 5)

    def test_v2_from_config(self):
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import spec_from_config

        cfg = get_default_config()
        cfg.MODEL.NAME = "cls_ttnet_v2"
        cfg.TRAIN.IMAGE_SIZE = [64, 64]
        model, variables, _ = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        x = jnp.zeros((1, 64, 64, 3))
        out = model.apply(variables, x, False)
        assert out.shape == (1, 5)

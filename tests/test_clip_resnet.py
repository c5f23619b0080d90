"""CLIP ModifiedResNet tower (models/clip_resnet.py, reference
evaluation/model.py:13-160) + its state-dict converter.

The golden fixture (tests/golden/clip_rn_tower.npz) stores a synthetic
OpenAI-format RN state dict and the output of an independent torch
re-implementation, so one test pins the flax tower's math AND the
converter's key mapping (convs OIHW->HWIO, BN running stats, attnpool
q/k/v/c_proj) leaf-for-leaf.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.models.clip_resnet import ModifiedResNet
from peft_vit_tpu.models.convert import (
    clip_rn_state_dict_to_tree,
    graft,
    infer_clip_rn_shape,
    is_clip_rn_state_dict,
)

GOLDEN = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden"
)


@pytest.fixture(scope="module")
def rn_sd():
    g = np.load(os.path.join(GOLDEN, "clip_rn_tower.npz"))
    sd = {
        k.replace("__", "."): g[k]
        for k in g.files
        if k.startswith("visual")
    }
    return g, sd


class TestConverter:
    def test_detect_and_infer(self, rn_sd):
        g, sd = rn_sd
        assert is_clip_rn_state_dict(sd)
        info = infer_clip_rn_shape(sd)
        assert info["vision_width"] == int(g["width"])
        assert info["vision_layers"] == tuple(g["layers"])
        assert info["embed_dim"] == int(g["embed_dim"])
        assert info["image_size"] == int(g["image"])
        assert not info["has_text"]

    def test_golden_forward_parity(self, rn_sd):
        g, sd = rn_sd
        flat, stats = clip_rn_state_dict_to_tree(sd)
        m = ModifiedResNet(
            layers=tuple(int(x) for x in g["layers"]),
            output_dim=int(g["embed_dim"]),
            image_size=int(g["image"]),
            width=int(g["width"]),
        )
        x = jnp.asarray(g["x"].transpose(0, 2, 3, 1))  # NCHW -> NHWC
        variables = m.init(jax.random.PRNGKey(0), x)
        strip = lambda d: {
            k[len("visual/"):]: v for k, v in d.items()
        }
        params, missing = graft(
            dict(variables["params"]), strip(flat), strict=True
        )
        assert not missing, missing
        bstats, _ = graft(
            dict(variables["batch_stats"]), strip(stats), strict=True
        )
        out = m.apply(
            {"params": params, "batch_stats": bstats}, x, True
        )
        np.testing.assert_allclose(
            np.asarray(out), g["out"], rtol=2e-4, atol=1e-3
        )


def rn_tiny_cfg():
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 5
    cfg.TRAIN.IMAGE_SIZE = [32, 32]
    cfg.MODEL.NAME = "RN50"
    cfg.MODEL.SPEC.EMBED_DIM = 16
    cfg.MODEL.SPEC.VISION.MODEL = "resnet"
    cfg.MODEL.SPEC.VISION.WIDTH = 8
    cfg.MODEL.SPEC.VISION.LAYERS = [1, 1, 1, 1]
    cfg.MODEL.SPEC.VISION.HEADS = 4
    cfg.MODEL.SPEC.TEXT.WIDTH = 16
    cfg.MODEL.SPEC.TEXT.HEADS = 2
    cfg.MODEL.SPEC.TEXT.LAYERS = 1
    return cfg


class TestFactory:
    def test_config_build_and_forward(self):
        from peft_vit_tpu.models.factory import (
            build_image_classifier,
            is_clip_model,
            is_clip_rn_cfg,
        )
        from peft_vit_tpu.peft import spec_from_config

        cfg = rn_tiny_cfg()
        assert is_clip_model(cfg) and is_clip_rn_cfg(cfg)
        model, variables, encode_text = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        assert "batch_stats" in variables
        assert encode_text is not None  # text tower from SPEC
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        logits = model.apply(variables, x, False)
        assert logits.shape == (2, 5)

    def test_train_mode_updates_batch_stats(self):
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import spec_from_config

        cfg = rn_tiny_cfg()
        model, variables, _ = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        x = jnp.asarray(
            np.random.RandomState(0)
            .randn(2, 32, 32, 3)
            .astype(np.float32)
        )
        _, mut = model.apply(
            variables, x, True, mutable=["batch_stats"]
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mut["batch_stats"])
        assert any(
            not np.allclose(a, b) for a, b in zip(before, after)
        )

    def test_probe_feature_extraction_path(self):
        """The probe/zero-shot closures must hand the BN tower its
        batch_stats collection (backbone_eval_variables)."""
        from peft_vit_tpu.models.factory import (
            backbone_eval_variables,
            build_image_classifier,
        )
        from peft_vit_tpu.peft import spec_from_config

        cfg = rn_tiny_cfg()
        model, variables, _ = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        ev = backbone_eval_variables(variables)
        assert "batch_stats" in ev
        feats = model.backbone.apply(
            ev, jnp.zeros((2, 32, 32, 3), jnp.float32)
        )
        assert feats.shape == (2, 16)

    def test_peft_masks_apply(self):
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import (
            build_mask,
            spec_from_config,
            split_params,
        )

        cfg = rn_tiny_cfg()
        model, variables, _ = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        mask = build_mask(variables["params"], "bitfit", num_layers=4)
        trainable, frozen = split_params(variables["params"], mask)
        n_train = sum(
            x.size for x in jax.tree_util.tree_leaves(trainable)
        )
        n_total = sum(
            x.size for x in jax.tree_util.tree_leaves(variables["params"])
        )
        assert 0 < n_train < n_total


class TestProbeEndToEnd:
    """BN towers through the actual probe command (the reference's
    workload for RN50/efficientnet backbones: frozen-feature probes,
    feature.py:221-260)."""

    @pytest.mark.parametrize("name", ["RN50", "efficientnet_b0"])
    def test_logistic_probe_e2e(self, name, tmp_path):
        from peft_vit_tpu.commands.linear_probe import logistic_main

        cfg = get_default_config()
        cfg.DATASET.DATASET = "synthetic"
        cfg.DATASET.NUM_CLASSES = 3
        cfg.DATASET.NUM_SAMPLES_PER_CLASS = 4
        cfg.TRAIN.IMAGE_SIZE = [32, 32]
        cfg.TEST.BATCH_SIZE_PER_GPU = 8
        cfg.MODEL.NAME = name
        if name == "RN50":
            cfg.MODEL.SPEC.EMBED_DIM = 16
            cfg.MODEL.SPEC.VISION.MODEL = "resnet"
            cfg.MODEL.SPEC.VISION.WIDTH = 8
            cfg.MODEL.SPEC.VISION.LAYERS = [1, 1, 1, 1]
            cfg.MODEL.SPEC.VISION.HEADS = 4
        else:
            cfg.MODEL.SPEC.VISION.MODEL = "efficientnet"
            cfg.MODEL.SPEC.VISION.WIDTH_MULT = 0.25
            cfg.MODEL.SPEC.VISION.DEPTH_MULT = 0.25
            cfg.MODEL.SPEC.VISION.HEAD_CH = 32
        acc = logistic_main(cfg, str(tmp_path))
        assert np.isfinite(acc) and 0.0 <= acc <= 100.0

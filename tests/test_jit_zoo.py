"""jit-trace smoke matrix over the whole backbone zoo (VERDICT r4 #7).

Round 4's Swin bug (shifted-window attention masks routed through jnp
-> TracerArrayConversionError, found only by the on-chip bench matrix)
proved that any backbone can harbor a tracer-vs-static-shape bug that
eager tests never see.  This matrix traces EVERY registered builder
family through ``jax.jit`` in BOTH train and eval mode on tiny shapes —
the cheapest test that would have caught that class a round earlier.

Reference registry parity: full_shot/main/lib/models/*.py (cls_resnet,
cls_hrnet*, cls_rexnet, cls_ttnet_v2/v3, cls_vit_conv/cswin, cls_swin)
and few_shot's timm/CLIP towers (efficientnet_b0, RN50, clip ViT).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.config.node import CfgNode as CN
from peft_vit_tpu.models.factory import build_image_classifier
from peft_vit_tpu.peft import spec_from_config


def _base(name, size):
    cfg = get_default_config()
    cfg.MODEL.NAME = name
    cfg.DATASET.NUM_CLASSES = 4
    cfg.TRAIN.IMAGE_SIZE = [size, size]
    return cfg


def cfg_clip_vit():
    cfg = _base("clip_tiny", 16)
    cfg.MODEL.SPEC.EMBED_DIM = 32
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = 32
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = 2
    return cfg


def cfg_timm_vit():
    cfg = _base("vit_tiny", 16)
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = 32
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = 2
    return cfg


def cfg_swin():
    # DEPTHS=[2,2] so stage blocks at odd depth use SHIFTED windows —
    # the round-4 bug class; DROP_PATH exercises the train-mode branch
    cfg = _base("cls_swin", 16)
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 4
    cfg.MODEL.SPEC.VISION.EMBED_DIM = 16
    cfg.MODEL.SPEC.VISION.DEPTHS = [2, 2]
    cfg.MODEL.SPEC.VISION.NUM_HEADS = [2, 2]
    cfg.MODEL.SPEC.VISION.WINDOW_SIZE = 2
    cfg.MODEL.SPEC.VISION.DROP_PATH_RATE = 0.2
    return cfg


def cfg_cswin():
    cfg = _base("cls_vit_cswin", 16)
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = 32
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = 2
    cfg.MODEL.SPEC.VISION.DROP_PATH_RATE = 0.1
    return cfg


def cfg_vit_conv():
    cfg = _base("cls_vit_conv", 16)
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = 32
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = 2
    return cfg


def cfg_resnet():
    cfg = _base("cls_resnet", 16)
    cfg.MODEL.SPEC.VISION["LAYERS_PER_STAGE"] = [1, 1]
    cfg.MODEL.SPEC.VISION["STEM_WIDTH"] = 8
    return cfg


def cfg_resnetd():
    cfg = _base("cls_resnetd", 16)
    cfg.MODEL.SPEC.VISION["LAYERS_PER_STAGE"] = [1, 1]
    cfg.MODEL.SPEC.VISION["STEM_WIDTH"] = 8
    return cfg


def cfg_rexnet():
    cfg = _base("cls_rexnet", 32)
    cfg.MODEL.SPEC.VISION["WIDTH_MULT"] = 0.5
    return cfg


def cfg_efficientnet():
    cfg = _base("efficientnet_b0", 32)
    return cfg


def cfg_ttnet_v2():
    return _base("cls_ttnet_v2", 64)


def cfg_ttnet_v3():
    cfg = _base("cls_ttnet_v3", 64)
    cfg.MODEL.EXTRA = CN(
        {
            "STEM": CN(
                {
                    "NUM_CHANNEL_KICKOFF": 8,
                    "NUM_CHANNEL_STEM_START": 16,
                    "EXPAND_STEM_START": 2,
                    "KERNEL_SIZE": 3,
                }
            ),
            "STAGES": CN(
                {
                    "NUM_CHANNEL_OUTPUT": [32, 64],
                    "NUM_BLOCK_REPEATS": [2, 2],
                    "KERNEL_SIZE": [3, 3],
                }
            ),
            "NUM_CHANNEL_FINAL": 128,
        },
        new_allowed=True,
    )
    return cfg


def cfg_hrnet():
    cfg = _base("cls_hrnet", 32)
    cfg.MODEL.SPEC.VISION["HRNET_WIDTH"] = 8
    cfg.MODEL.SPEC.VISION["STAGE_MODULES"] = [1, 1]
    return cfg


def cfg_hrnet_v2():
    cfg = _base("cls_hrnet_v2", 64)
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
    return cfg


def cfg_hrnet_v4():
    cfg = _base("cls_hrnet_v4", 64)
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
    return cfg


def cfg_clip_rn():
    cfg = _base("RN50", 32)
    cfg.MODEL.SPEC.EMBED_DIM = 16
    cfg.MODEL.SPEC.VISION.MODEL = "resnet"
    cfg.MODEL.SPEC.VISION.WIDTH = 8
    cfg.MODEL.SPEC.VISION.LAYERS = [1, 1, 1, 1]
    cfg.MODEL.SPEC.VISION.HEADS = 4
    cfg.MODEL.SPEC.TEXT.WIDTH = 16
    cfg.MODEL.SPEC.TEXT.HEADS = 2
    cfg.MODEL.SPEC.TEXT.LAYERS = 1
    return cfg


ZOO = [
    ("clip_vit", cfg_clip_vit),
    ("timm_vit", cfg_timm_vit),
    ("swin_shifted", cfg_swin),
    ("cswin", cfg_cswin),
    ("vit_conv", cfg_vit_conv),
    ("resnet", cfg_resnet),
    ("resnetd", cfg_resnetd),
    ("rexnet", cfg_rexnet),
    ("efficientnet_b0", cfg_efficientnet),
    ("ttnet_v2", cfg_ttnet_v2),
    ("ttnet_v3", cfg_ttnet_v3),
    ("hrnet", cfg_hrnet),
    ("hrnet_v2", cfg_hrnet_v2),
    ("hrnet_v4", cfg_hrnet_v4),
    ("clip_rn50", cfg_clip_rn),
]


@pytest.mark.parametrize("name,make_cfg", ZOO, ids=[n for n, _ in ZOO])
def test_backbone_jits_train_and_eval(name, make_cfg):
    cfg = make_cfg()
    model, variables, _ = build_image_classifier(
        cfg, spec_from_config(cfg), 4
    )
    size = int(cfg.TRAIN.IMAGE_SIZE[0])
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, size, size, 3), jnp.float32
    )
    has_bn = "batch_stats" in variables

    @jax.jit
    def eval_step(v, x):
        return model.apply(v, x, False)

    out = eval_step(variables, x)
    assert out.shape == (2, 4)
    assert bool(jnp.isfinite(out).all()), name

    rngs = {"dropout": jax.random.PRNGKey(1), "drop_path": jax.random.PRNGKey(2)}

    @jax.jit
    def train_step(v, x):
        if has_bn:
            out, updates = model.apply(
                v, x, True, mutable=["batch_stats"], rngs=rngs
            )
            return out, updates["batch_stats"]
        return model.apply(v, x, True, rngs=rngs), None

    out_t, new_stats = train_step(variables, x)
    assert out_t.shape == (2, 4)
    assert bool(jnp.isfinite(out_t).all()), name
    if has_bn:
        # train mode actually updated the running stats
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(variables["batch_stats"]),
                jax.tree_util.tree_leaves(new_stats),
            )
        )
        assert changed, name

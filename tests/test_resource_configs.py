"""Every shipped resource yaml must merge into the default config.

The reference exposes its benchmark surface as resources/datasets/*.yaml
and resources/model/*.yaml handed to --ds/--model; these tests pin that
every file we ship parses, merges, and (for models) builds — so a user
can point pvt_run at any of them without a yacs key error.
"""

import glob
import os

import pytest

from peft_vit_tpu.config import get_default_config

RES = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "..",
    "peft_vit_tpu",
    "resources",
)
DATASET_YAMLS = sorted(glob.glob(os.path.join(RES, "datasets", "*.yaml")))
MODEL_YAMLS = sorted(glob.glob(os.path.join(RES, "model", "*.yaml")))


def test_inventories_nonempty():
    assert len(DATASET_YAMLS) >= 30, DATASET_YAMLS
    assert len(MODEL_YAMLS) >= 10, MODEL_YAMLS


@pytest.mark.parametrize(
    "path", DATASET_YAMLS, ids=[os.path.basename(p) for p in DATASET_YAMLS]
)
def test_dataset_yaml_merges(path):
    cfg = get_default_config()
    cfg.merge_from_file(path)
    assert cfg.DATASET.DATASET


@pytest.mark.parametrize(
    "path", MODEL_YAMLS, ids=[os.path.basename(p) for p in MODEL_YAMLS]
)
def test_model_yaml_merges(path):
    cfg = get_default_config()
    cfg.merge_from_file(path)
    assert cfg.MODEL.NAME


def test_classification_datasets_have_prompts():
    """Datasets with a class count must resolve class names + templates
    (the 26 ported prompt JSONs)."""
    from peft_vit_tpu.data.prompts import class_map, template_map

    missing = []
    for path in DATASET_YAMLS:
        cfg = get_default_config()
        cfg.merge_from_file(path)
        name = str(cfg.DATASET.DATASET)
        ncls = int(cfg.DATASET.NUM_CLASSES)
        # caption / hub-manifest-only entries carry no class list
        # caption / hub-manifest-only entries carry no built-in class
        # list (the reference resolves these from the dataset-hub
        # manifest at runtime; 'isic' included)
        if ncls <= 0 or name in (
            "im_cap_coco",
            "b92-regular-ic-benchmark",
            "ping-attack-on-titan-plus",
            "ping-whiskey-plus",
            "isic",
        ):
            continue
        classes = class_map(name)
        if classes is None:
            missing.append(name)
            continue
        assert len(classes) == ncls, (name, len(classes), ncls)
        assert template_map(name)
    assert not missing, missing

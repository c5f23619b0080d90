"""Composed full_shot EPOCH-LOOP parity against the EXECUTED reference
(VERDICT r4 #6 — the full_shot twin of test_refexec_trajectory.py).

tests/golden/generate_trainer_epoch_from_reference.py ran the
reference's real ``train_one_epoch`` + ``test``
(full_shot/main/lib/core/function.py:46-268) composed exactly as
``tools/train.py:148-240`` composes them — SGD(momentum, nesterov) via
``build_optimizer``/``set_wd``, MultiStep decay stepped at each epoch
end, per-step EMA with assign->validate->resume, grad-norm clipping,
Mixup soft targets (recorded; both frameworks consume the identical
post-mix tensors), AverageMeter means — on two tiny towers built from
the reference's OWN model files (cls_vit.py, cls_resnet.py).  Here the
production ``engine/trainer.py`` Trainer replays the identical protocol
from the converted initial weights and must reproduce:

* every per-epoch mean train loss,
* every per-epoch raw val top-1 and (ViT leg) EMA val top-1,
* the per-epoch learning rates,
* (loosely) the final parameters.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.engine.trainer import Trainer
from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.models.convert import graft, timm_vit_state_dict_to_tree
from peft_vit_tpu.peft import build_mask

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _sd(g, prefix="sd."):
    return {
        k[len(prefix):]: np.asarray(v)
        for k, v in g.items()
        if k.startswith(prefix)
    }


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def _base_cfg(g, num_classes):
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = num_classes
    cfg.MODEL.NUM_CLASSES = num_classes
    cfg.TRAIN.BATCH_SIZE_PER_GPU = int(g["batch"])
    cfg.TRAIN.END_EPOCH = int(g["epochs"])
    cfg.TRAIN.LR = float(g["lr"])
    cfg.TRAIN.WD = float(g["wd"])
    cfg.TRAIN.OPTIMIZER = "sgd"
    cfg.TRAIN.MOMENTUM = 0.9
    cfg.TRAIN.NESTEROV = True
    cfg.TRAIN.CLIP_GRAD_NORM = float(g["clip_norm"])
    cfg.TRAIN.LR_SCHEDULER.METHOD = "multistep"
    cfg.TRAIN.SCHEDULE = [int(m) for m in g["milestones"]]
    cfg.PRINT_FREQ = 1  # record EVERY iteration loss (AverageMeter.avg)
    cfg.TPU.STEPS_PER_DISPATCH = 1
    cfg.TPU.PREFETCH_DEPTH = 0
    cfg.AUG.RANDOM_FLIP = False
    return cfg


def _epoch_batches(g, epoch, mixed):
    """The exact batch sequence the reference consumed in `epoch`."""
    b = int(g["batch"])
    if mixed:
        per = g["mixed_x"].shape[0] // int(g["epochs"])
        for i in range(per):
            x = g["mixed_x"][epoch * per + i].transpose(0, 2, 3, 1)
            y = g["mixed_y"][epoch * per + i]
            yield np.ascontiguousarray(x), y
    else:
        x, y = g["x_train"], g["y_train"]
        for i in range(0, len(y), b):
            yield (
                np.ascontiguousarray(
                    x[i : i + b].transpose(0, 2, 3, 1)
                ),
                y[i : i + b],
            )


def _val_batches(g):
    b = int(g["batch"])
    x, y = g["x_val"], g["y_val"]
    for i in range(0, len(y), b):
        yield (
            np.ascontiguousarray(x[i : i + b].transpose(0, 2, 3, 1)),
            y[i : i + b],
        )


def _run_epochs(trainer, g, mixed):
    losses, val, val_ema = [], [], []
    for e in range(int(g["epochs"])):
        stats = trainer.train_one_epoch(_epoch_batches(g, e, mixed), e)
        losses.append(stats["loss"])
        val.append(trainer.evaluate(_val_batches(g)))
        if trainer.state.ema is not None:
            val_ema.append(trainer.evaluate(_val_batches(g), use_ema=True))
    return np.asarray(losses), np.asarray(val), np.asarray(val_ema)


class TestTrainerEpochVsExecutedReference:
    def test_vit_mixup_ema_leg(self):
        """cls_vit + recorded Mixup soft targets + label smoothing +
        grad-norm clip 1.0 + per-step EMA(0.9) + MultiStep[2]@0.1:
        the Trainer's per-epoch mean losses, raw val top-1, EMA val
        top-1, and per-epoch lrs all match the executed reference."""
        g = np.load(os.path.join(GOLDEN, "refexec_trainer_epoch_vit.npz"))
        sd = _sd(g)
        width = sd["cls_token"].shape[-1]
        layers = len(
            {k.split(".")[1] for k in sd if k.startswith("blocks.")}
        )
        patch = sd["patch_embed.proj.weight"].shape[-1]
        n_patches = sd["pos_embed"].shape[1] - 1
        image = patch * int(np.sqrt(n_patches))
        classes = sd["head.weight"].shape[0]
        model = ImageClassifier(
            backbone=VisionTransformer(
                image_size=image,
                patch_size=patch,
                width=width,
                layers=layers,
                heads=int(g["heads"]),
                style="timm",
                use_flash=False,
            ),
            num_classes=classes,
        )
        x0 = jnp.zeros((1, image, image, 3))
        params = model.init(jax.random.PRNGKey(0), x0)["params"]
        src = {
            "backbone/" + k: v
            for k, v in timm_vit_state_dict_to_tree(sd).items()
        }
        src["classifier/head/kernel"] = sd["head.weight"].T
        src["classifier/head/bias"] = sd["head.bias"]
        params, missing = graft(params, src)
        assert not missing, missing

        cfg = _base_cfg(g, classes)
        # the recorded post-mix targets are soft (Mixup owns the label
        # smoothing) — train on soft-target CE exactly like the
        # reference's SoftTargetCrossEntropy (lib/core/loss.py:133-134)
        cfg.LOSS.LOSS = "soft_target"
        cfg.TRAIN.EMA_DECAY = float(g["ema_decay"])
        mask = build_mask(params, "full", num_layers=layers)
        trainer = Trainer(
            cfg, model, params, mask,
            steps_per_epoch=g["mixed_x"].shape[0] // int(g["epochs"]),
        )
        losses, val, val_ema = _run_epochs(trainer, g, mixed=True)

        np.testing.assert_allclose(
            losses, g["epoch_losses"], rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(val, g["val_top1"], atol=1e-6)
        np.testing.assert_allclose(val_ema, g["val_top1_ema"], atol=1e-6)
        # per-epoch lrs: the schedule must decay at the same boundary
        lrs = [
            float(trainer.schedule(e * trainer.steps_per_epoch))
            for e in range(int(g["epochs"]))
        ]
        np.testing.assert_allclose(lrs, g["lrs"], rtol=1e-6)

    def test_resnet_bn_leg(self):
        """cls_resnet Bottleneck (live BatchNorm) + hard CE + WD 1e-4
        with WITHOUT_WD_LIST=['bn'] + MultiStep[2]@0.1: per-epoch mean
        losses and running-stats val top-1 match the executed
        reference — pins the BN train/eval split, the wd mask, and the
        meter math composed."""
        from peft_vit_tpu.models.resnet import ResNet

        g = np.load(
            os.path.join(GOLDEN, "refexec_trainer_epoch_resnet.npz")
        )
        sd = _sd(g)
        classes = sd["fc.weight"].shape[0]

        params, stats = {}, {}

        def put_conv(path, key):
            params[path + "/kernel"] = _conv(sd[key + ".weight"])

        def put_bn(path, key):
            params[path + "/scale"] = sd[key + ".weight"]
            params[path + "/bias"] = sd[key + ".bias"]
            stats[path + "/mean"] = sd[key + ".running_mean"]
            stats[path + "/var"] = sd[key + ".running_var"]

        put_conv("conv1", "conv1")
        put_bn("bn1", "bn1")
        for si in (1, 2):
            o = f"layer{si}_block0"
            p = f"layer{si}.0"
            for c in ("conv1", "conv2", "conv3"):
                put_conv(f"{o}/{c}", f"{p}.{c}")
            for b in ("bn1", "bn2", "bn3"):
                put_bn(f"{o}/{b}", f"{p}.{b}")
            put_conv(f"{o}/downsample", f"{p}.downsample.1")
            put_bn(f"{o}/bn_down", f"{p}.downsample.2")
            if f"{p}.se.fc.0.weight" in sd:
                params[f"{o}/se/fc1/kernel"] = sd[f"{p}.se.fc.0.weight"].T
                params[f"{o}/se/fc2/kernel"] = sd[f"{p}.se.fc.2.weight"].T

        backbone = ResNet(
            layers=(1, 1),
            width=16,
            se_ratio=1.0 / 16.0,
            se_stages=(False, True),
            avg_down=True,
        )
        model = ImageClassifier(backbone=backbone, num_classes=classes)
        image = g["x_train"].shape[-1]
        x0 = jnp.zeros((1, image, image, 3))
        variables = model.init(jax.random.PRNGKey(0), x0)
        vflat = traverse_util.flatten_dict(variables["params"], sep="/")
        src = {"backbone/" + k: v for k, v in params.items()}
        src["classifier/head/kernel"] = sd["fc.weight"].T
        src["classifier/head/bias"] = sd["fc.bias"]
        assert set(vflat) == set(src), sorted(set(vflat) ^ set(src))[:6]
        full = traverse_util.unflatten_dict(src, sep="/")
        batch_stats = traverse_util.unflatten_dict(
            {"backbone/" + k: v for k, v in stats.items()}, sep="/"
        )

        cfg = _base_cfg(g, classes)
        cfg.LOSS.LOSS = "softmax"
        cfg.TRAIN.WITHOUT_WD_LIST = ["bn"]
        mask = build_mask(full, "full", num_layers=0)
        trainer = Trainer(
            cfg, model, full, mask,
            steps_per_epoch=len(g["y_train"]) // int(g["batch"]),
            batch_stats=batch_stats,
        )
        losses, val, _ = _run_epochs(trainer, g, mixed=False)

        np.testing.assert_allclose(
            losses, g["epoch_losses"], rtol=2e-3, atol=2e-4
        )
        np.testing.assert_allclose(val, g["val_top1"], atol=1e-6)

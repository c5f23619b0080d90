"""Full-shot training command (reference full_shot/main/tools/train.py).

``python -m peft_vit_tpu.commands.train --cfg experiments/r50.yaml``
runs the distributed pre-training/fine-tuning loop: optax optimizer +
schedule from config, EMA/SWA, mixup, bf16, NaN guard, Orbax auto-resume.
Multi-host: launch one process per host with jax.distributed env vars —
the mesh spans all chips, replacing torch.distributed.launch (run.sh:3-11).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import jax
import numpy as np

from ..config import get_default_config
from ..data import construct_splits
from ..engine.trainer import PreemptedError, Trainer, batch_iterator
from ..models.factory import build_image_classifier
from ..peft import build_mask, count_trainable, spec_from_config
from ..utils.logging import create_logger, final_result_line, log_trainable_params

logger = logging.getLogger(__name__)


def train_main(cfg) -> float:
    from ..data.native import native_available

    spec = spec_from_config(cfg)

    # streaming path (TRAIN_TSV_LIST + native runtime): the dataset is
    # never materialized in host RAM — decode/prefetch runs in the C++
    # ring (tools/train.py:26,154-155 DataLoader-worker analog)
    # device-side timm-aug: batches ship raw uint8; the jitted step
    # augments + normalizes (data/augment.py)
    from ..data.augment import make_train_transform

    device_transform = make_train_transform(cfg) is not None

    train_folder = (
        os.path.join(cfg.DATASET.ROOT, cfg.DATASET.TRAIN_SET)
        if cfg.DATASET.TRAIN_SET
        else ""
    )
    _test_dir = cfg.DATASET.TEST_SET or cfg.DATASET.VAL_SET
    test_folder = (
        os.path.join(cfg.DATASET.ROOT, _test_dir) if _test_dir else ""
    )
    folder_mode = (
        not cfg.DATASET.TRAIN_TSV_LIST
        and bool(cfg.DATASET.ROOT)
        and os.path.isdir(train_folder)
    )
    zip_mode = False
    if (
        not cfg.DATASET.TRAIN_TSV_LIST
        and not folder_mode
        and native_available()
    ):
        from ..data.elevater import scan_zip_split

        zip_mode = scan_zip_split(cfg, "train") is not None
    streaming = (
        bool(cfg.DATASET.TRAIN_TSV_LIST) or folder_mode or zip_mode
    ) and native_available()
    if streaming:
        from ..data.streaming import StreamingSource

        # always ship raw uint8: the jitted step flips + normalizes (or
        # runs the timm-aug transform) on device — 4x fewer host->HBM
        # bytes and zero host float work.  STEPS_PER_DISPATCH=K makes the
        # loader emit K*B-sample batches that reshape (zero-copy) into
        # (K, B, ...) scan chunks: one transfer + one dispatch per K steps
        k_disp = int(cfg.TPU.get("STEPS_PER_DISPATCH", 1))
        train_src = StreamingSource(
            cfg, "train", normalize=False, batch_multiplier=k_disp
        )
        has_eval = bool(cfg.DATASET.TEST_TSV_LIST) or (
            folder_mode and os.path.isdir(test_folder)
        )
        if zip_mode and not has_eval:
            from ..data.elevater import scan_zip_split

            has_eval = scan_zip_split(cfg, "test") is not None
        eval_src = (
            StreamingSource(cfg, "test", normalize=False)
            if has_eval
            else None
        )
        num_classes = int(cfg.DATASET.NUM_CLASSES)
        if num_classes <= 0 and folder_mode:
            num_classes = sum(
                os.path.isdir(os.path.join(train_folder, d))
                for d in os.listdir(train_folder)
            )
        if num_classes <= 0 and zip_mode:
            num_classes = int(np.max(train_src._labels_fn())) + 1
        assert num_classes > 0, (
            "streaming training needs DATASET.NUM_CLASSES (or an "
            "ImageFolder tree to count classes from)"
        )
        splits = None
    else:
        if cfg.DATASET.TRAIN_TSV_LIST:
            logger.warning(
                "native runtime unavailable: TSV data will be fully "
                "materialized in host RAM"
            )
        splits = construct_splits(cfg, normalize=not device_transform)
        num_classes = splits.num_classes
        train_src = eval_src = None

    # (TPU.SEQUENCE_PARALLEL: the factory installs the config mesh
    # globally before init so the model's bare-spec activation
    # constraints resolve in every later trace, including the Trainer's)
    model, variables, _ = build_image_classifier(cfg, spec, num_classes)
    params = variables["params"]

    method = cfg.PEFT.METHOD if cfg.PEFT.METHOD != "none" else "full"
    num_layers = getattr(model.backbone, "layers", 12)
    mask = build_mask(params, method, num_layers=num_layers)
    log_trainable_params(count_trainable(params, mask))

    batch = int(cfg.TRAIN.BATCH_SIZE_PER_GPU) * jax.device_count()
    steps_per_epoch = (
        train_src.steps_per_epoch
        if streaming
        else max(len(splits.y_train) // batch, 1)
    )
    mesh = None
    if jax.device_count() > 1:
        from ..parallel import mesh_from_config

        mesh = mesh_from_config(cfg)
        logger.info(
            "=> mesh %s over %d devices",
            dict(zip(mesh.axis_names, mesh.devices.shape)),
            jax.device_count(),
        )
    trainer = Trainer(
        cfg,
        model,
        params,
        mask,
        steps_per_epoch,
        mesh=mesh,
        batch_stats=variables.get("batch_stats"),
    )

    if streaming:
        # host batches only: the Trainer's own _device_prefetch stage does
        # the (mesh-sharded) device placement — putting them on a device
        # here would commit each batch to device 0 and force a second
        # device-to-device copy.  host_prefetch keeps the native decode
        # ring draining while the consumer blocks on the device.  In scan
        # mode (k_disp > 1) the source yields pre-chunked (K, B, ...)
        # arrays and the Trainer does ONE transfer + dispatch per chunk.
        from ..data.streaming import host_prefetch

        # the optional 2nd arg lets the Trainer resume a preempted epoch
        # mid-stream: the source seeks past the trained prefix without
        # decoding it (data/streaming.py skip_batches)
        train_batches = lambda e, skip=0: host_prefetch(
            train_src.batches(e, skip_batches=skip), depth=2
        )
        if eval_src is not None:
            eval_batches = lambda: eval_src.device_batches(0)
        else:
            eval_splits = construct_splits(
                cfg, test_split_only=True, normalize=not device_transform
            )

            def eval_batches():
                return batch_iterator(
                    eval_splits.x_test,
                    eval_splits.y_test,
                    int(cfg.TEST.BATCH_SIZE_PER_GPU),
                    shuffle=False,
                    drop_last=False,
                )

    else:

        def train_batches(epoch):
            return batch_iterator(
                splits.x_train,
                splits.y_train,
                batch,
                shuffle=bool(cfg.TRAIN.SHUFFLE),
                seed=epoch,
            )

        def eval_batches():
            return batch_iterator(
                splits.x_test,
                splits.y_test,
                int(cfg.TEST.BATCH_SIZE_PER_GPU),
                shuffle=False,
                drop_last=False,
            )

    ckpt_dir = os.path.join(
        cfg.OUTPUT_DIR, cfg.DATASET.DATASET, cfg.NAME, "checkpoints"
    )
    tb_dir = os.path.join(
        cfg.OUTPUT_DIR, cfg.DATASET.DATASET, cfg.NAME, "tb_log"
    )
    best = trainer.fit(train_batches, eval_batches, ckpt_dir, tb_dir)
    final_result_line("accuracy", best)
    return best


def main(argv=None):
    parser = argparse.ArgumentParser(description="full-shot training")
    parser.add_argument("--cfg", required=False, default=None)
    parser.add_argument("opts", nargs=argparse.REMAINDER)
    args = parser.parse_args(argv)
    cfg = get_default_config()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
        cfg.NAME = cfg.NAME or os.path.splitext(
            os.path.basename(args.cfg)
        )[0]
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.NAME = cfg.NAME or "train"
    create_logger(cfg, "train")
    cfg.freeze()
    try:
        return train_main(cfg)
    except PreemptedError as e:
        # clean preemption: state is checkpointed; EX_TEMPFAIL tells the
        # scheduler this is a retry, not a failure
        logging.getLogger(__name__).warning("=> %s", e)
        sys.exit(75)


if __name__ == "__main__":
    main()

"""CLIP contrastive pre-training.

Reference: full_shot/main/tools/train_clip.py:76+ driving
lib/core/function_clip.py with the clip_openai.py model (:380-552) —
symmetric InfoNCE over (image, caption) pairs, optionally against the
all-gathered GLOBAL batch (the GATHER_TENSORS spec, clip_openai.py:551-552
via utils/comm.py gather_tensors).

TPU-native: one jitted step (engine.contrastive.make_clip_train_step),
batch data-sharded over the mesh, differentiable jax.lax.all_gather inside
shard_map instead of torch.distributed gather hooks.

    python -m peft_vit_tpu.commands.train_clip --cfg experiments/clip.yaml \
        DATASET.TRAIN_TSV_LIST "['pairs.tsv']" MODEL.SPEC.GATHER_TENSORS True

Pair TSVs are ``key<TAB>base64(image)<TAB>caption`` rows; with no TSV
configured a deterministic synthetic pair set is used (smoke/bench).
"""

from __future__ import annotations

import argparse
import base64
import io
import logging
import os
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_default_config
from ..data.tokenizer import tokenize
from ..data.transforms import resize_center_crop
from ..engine.contrastive import make_clip_train_step
from ..engine.optim import build_lr_schedule, build_optimizer
from ..models.clip import clip_from_config
from ..peft import spec_from_config
from ..utils.logging import create_logger, final_result_line

logger = logging.getLogger(__name__)


def load_pairs(cfg) -> Tuple[np.ndarray, List[str]]:
    """(images_u8 (N, S, S, 3), captions) from pair TSVs, or a synthetic
    learnable pair set when none are configured."""
    size = int(cfg.TRAIN.IMAGE_SIZE[0])
    tsv_list = cfg.DATASET.TRAIN_TSV_LIST
    if tsv_list:
        from PIL import Image

        xs, caps = [], []
        root = cfg.DATASET.ROOT
        for p in tsv_list:
            path = os.path.join(root, p) if root else p
            with open(path) as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) < 3:
                        continue
                    img = Image.open(io.BytesIO(base64.b64decode(parts[1])))
                    xs.append(resize_center_crop(img, size))
                    caps.append(parts[2])
        return np.stack(xs), caps
    from ..data.registry import synthetic_dataset

    n_cls = int(cfg.DATASET.NUM_CLASSES) or 8
    x, y = synthetic_dataset(n_cls, 16, size, seed=0)
    caps = [f"a photo of a thing number {int(c)}" for c in y]
    return x, caps


def train_clip_main(cfg) -> float:
    spec = spec_from_config(cfg)
    model = clip_from_config(cfg, spec)
    x_u8, caps = load_pairs(cfg)
    mean = np.asarray(cfg.INPUT.MEAN, np.float32) * 255.0
    std = np.asarray(cfg.INPUT.STD, np.float32) * 255.0
    x = (x_u8.astype(np.float32) - mean) / std
    ctx = int(cfg.MODEL.SPEC.TEXT.CONTEXT_LENGTH)
    tokens = tokenize(caps, ctx).astype(np.int32)
    n = len(x)
    logger.info("=> %d image-text pairs", n)

    params = model.init(
        jax.random.PRNGKey(int(cfg.DATASET.RANDOM_SEED_SAMPLING)),
        jnp.zeros((1, *x.shape[1:])),
        jnp.ones((1, ctx), jnp.int32),
    )["params"]

    batch = int(cfg.TRAIN.BATCH_SIZE_PER_GPU) * jax.device_count()
    steps_per_epoch = max(n // batch, 1)
    schedule = build_lr_schedule(cfg, steps_per_epoch)
    tx = build_optimizer(cfg, params, steps_per_epoch, schedule)

    mesh = None
    gather = bool(cfg.MODEL.SPEC.get("GATHER_TENSORS", False))
    if jax.device_count() > 1:
        from ..parallel import mesh_from_config

        mesh = mesh_from_config(cfg)
    step = make_clip_train_step(model, tx, mesh=mesh, gather=gather)

    opt_state = tx.init(params)
    rng = np.random.RandomState(0)
    loss_v = float("nan")
    for epoch in range(int(cfg.TRAIN.BEGIN_EPOCH), int(cfg.TRAIN.END_EPOCH)):
        perm = rng.permutation(n)
        t0 = time.time()
        losses = []
        for i in range(steps_per_epoch):
            j = perm[i * batch : (i + 1) * batch]
            if len(j) < batch:
                break
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(x[j]), jnp.asarray(tokens[j])
            )
            if (i + 1) % int(cfg.PRINT_FREQ) == 0 or i == 0:
                loss_v = float(loss)  # host fetch = sync
                losses.append(loss_v)
                if not np.isfinite(loss_v):
                    raise FloatingPointError(
                        f"NaN loss at epoch {epoch} step {i}"
                    )
        dt = time.time() - t0
        logger.info(
            "=> Epoch %d: loss %.4f (%.1f pairs/s)",
            epoch,
            float(np.mean(losses)) if losses else float("nan"),
            steps_per_epoch * batch / max(dt, 1e-9),
        )
        if cfg.OUTPUT_DIR:
            from ..engine.checkpoint import save_checkpoint

            save_checkpoint(
                os.path.join(cfg.OUTPUT_DIR, "clip_checkpoints"),
                epoch,
                {"params": params, "epoch": jnp.asarray(epoch)},
            )
    final_result_line("clip_loss", loss_v)
    return loss_v


def main(argv=None):
    parser = argparse.ArgumentParser(description="CLIP pre-training")
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
    cfg.NAME = cfg.NAME or "train_clip"
    create_logger(cfg, "train_clip")
    cfg.freeze()
    return train_clip_main(cfg)


if __name__ == "__main__":
    main()

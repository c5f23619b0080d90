"""Optimizer + LR schedule builders on optax.

Reference surfaces reproduced:

* ``build_optimizer`` — few_shot optim/build.py:19-171 and full_shot
  lib/optim/build.py: sgd / adam / adamW / rmsprop, a no-weight-decay list
  (bias + norm params, WITHOUT_WD_LIST), and TWO_LR (backbone at 0.1x lr,
  head at lr; optim/build.py:102-117).
* ``LARC`` — lib/optim/LARC.py:7-109 (clipping variant of LARS), here an
  optax gradient transformation.
* schedules — few_shot step decay (adjust_learning_rate,
  adapter_tuning_clip.py:380-386), full_shot MultiStep / CosineAnnealing /
  WarmupCosine (lib/scheduler/warmup_lr.py:59-135).

The PEFT twist: everything is ``optax.masked`` over the trainable mask, so
optimizer state is proportional to adapter size, not model size (north-star
memory constraint).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util


# ---------------------------------------------------------------------------
# LARC
# ---------------------------------------------------------------------------


def larc(
    trust_coefficient: float = 0.02,
    clip: bool = True,
    eps: float = 1e-8,
    learning_rate: float = 1.0,
) -> optax.GradientTransformation:
    """LARC (lib/optim/LARC.py): per-parameter trust-ratio scaling.

    adaptive_lr = trust * ||p|| / (||g|| + eps); in clip mode the gradient
    is scaled by min(adaptive_lr / lr, 1).
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("larc requires params")

        def scale(g, p):
            pn = jnp.linalg.norm(p.reshape(-1))
            gn = jnp.linalg.norm(g.reshape(-1))
            adaptive = trust_coefficient * pn / (gn + eps)
            if clip:
                s = jnp.minimum(adaptive / learning_rate, 1.0)
            else:
                s = adaptive
            s = jnp.where((pn > 0) & (gn > 0), s, 1.0)
            return g * s

        updates = jax.tree_util.tree_map(scale, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# weight-decay / lr grouping masks
# ---------------------------------------------------------------------------

_NO_WD_DEFAULT = ("bias", "/ln_", "norm", "bn", "class_embedding",
                  "positional_embedding", "logit_scale")


def no_weight_decay_mask(params, without_wd_list=()) -> Dict:
    """True where weight decay applies.  Mirrors the reference `_set_wd`
    (optim/build.py): bias / LayerNorm / BatchNorm params get no decay."""
    keys = tuple(without_wd_list) or _NO_WD_DEFAULT
    flat = traverse_util.flatten_dict(params, sep="/")
    # None leaves (peft.split_params holes) stay None so the mask tree
    # matches the param tree structure under jax/optax flattening.
    mask = {
        k: (None if v is None else not any(s in k.lower() for s in keys))
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(mask, sep="/")


def backbone_lr_mask(params) -> Dict:
    """True for backbone params (0.1x lr under TWO_LR), False for head."""
    flat = traverse_util.flatten_dict(params, sep="/")
    mask = {
        k: (None if v is None else not k.startswith("classifier/"))
        for k, v in flat.items()
    }
    return traverse_util.unflatten_dict(mask, sep="/")


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def step_decay_schedule(
    base_lr: float, milestones, steps_per_epoch: int, gamma: float = 0.1
) -> optax.Schedule:
    """Reference few-shot step decay: lr *= 0.1 per passed milestone epoch
    (adjust_learning_rate, adapter_tuning_clip.py:380-386)."""
    milestones = sorted(int(m) for m in milestones)

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        lr = base_lr
        for m in milestones:
            lr = jnp.where(epoch >= m, lr * gamma, lr)
        return jnp.asarray(lr, jnp.float32)

    return schedule


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    warmup_factor: float = 0.001,
    end_lr: float = 0.0,
) -> optax.Schedule:
    """WarmupCosineLR (lib/scheduler/warmup_lr.py:59-135, detectron2 port):
    linear warmup from warmup_factor*lr, then cosine to end_lr."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = jnp.asarray(max(warmup_steps, 1), jnp.float32)
        alpha = count / warm
        warmup_lr = base_lr * (warmup_factor * (1 - alpha) + alpha)
        progress = jnp.clip(
            (count - warmup_steps) / max(total_steps - warmup_steps, 1),
            0.0,
            1.0,
        )
        cos = end_lr + 0.5 * (base_lr - end_lr) * (
            1.0 + jnp.cos(jnp.pi * progress)
        )
        return jnp.where(count < warmup_steps, warmup_lr, cos)

    return schedule


def cyclic_schedule(
    base_lr: float,
    max_lr: float,
    step_size_up: int,
    step_size_down: int = 0,
    mode: str = "triangular",
    gamma: float = 1.0,
) -> optax.Schedule:
    """torch.optim.lr_scheduler.CyclicLR semantics (lib/scheduler/build.py
    CyclicLR branch): triangular / triangular2 / exp_range."""
    down = step_size_down or step_size_up
    period = step_size_up + down

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        cycle = jnp.floor(1.0 + count / period)
        pos = count - (cycle - 1.0) * period
        frac = jnp.where(
            pos < step_size_up,
            pos / step_size_up,
            1.0 - (pos - step_size_up) / down,
        )
        amp = max_lr - base_lr
        if mode == "triangular2":
            amp = amp / (2.0 ** (cycle - 1.0))
        elif mode == "exp_range":
            amp = amp * gamma**count
        return base_lr + amp * jnp.clip(frac, 0.0, 1.0)

    return schedule


def build_lr_schedule(cfg, steps_per_epoch: int) -> optax.Schedule:
    method = str(cfg.TRAIN.LR_SCHEDULER.METHOD).lower()
    base_lr = float(cfg.TRAIN.LR)
    epochs = int(cfg.TRAIN.END_EPOCH)
    total = max(epochs * steps_per_epoch, 1)
    if method in ("step", "multistep"):
        milestones = cfg.TRAIN.SCHEDULE or []
        return step_decay_schedule(base_lr, milestones, steps_per_epoch)
    if method in ("cosine", "cosineannealing"):
        return optax.cosine_decay_schedule(base_lr, total)
    if method in ("warmupcosine", "warmup_cosine"):
        args = cfg.TRAIN.LR_SCHEDULER
        warmup_epochs = float(args.get("WARMUP_EPOCH", 5))
        warmup_factor = float(args.get("WARMUP_FACTOR", 0.001))
        return warmup_cosine_schedule(
            base_lr,
            total,
            warmup_steps=int(warmup_epochs * steps_per_epoch),
            warmup_factor=warmup_factor,
        )
    if method == "constant":
        return optax.constant_schedule(base_lr)
    if method in ("cyclic", "cycliclr"):
        args = cfg.TRAIN.LR_SCHEDULER
        return cyclic_schedule(
            base_lr,
            float(args.get("MAX_LR", base_lr * 10)),
            int(args.get("STEP_SIZE_UP", 2000)),
            int(args.get("STEP_SIZE_DOWN", 0)),
            str(args.get("CYCLIC_MODE", "triangular")),
            float(args.get("CYCLIC_GAMMA", 1.0)),
        )
    if method in ("swalr", "swa"):
        # SWALR: anneal to SWA.LR_RATIO * base over ANNEAL_EPOCHS after
        # SWA.BEGIN_EPOCH (torch.optim.swa_utils.SWALR; tools/swa_finetune.py)
        from .ema import swalr_schedule

        return swalr_schedule(
            base_lr,
            base_lr * float(cfg.SWA.LR_RATIO),
            max(int(cfg.SWA.BEGIN_EPOCH), 0) * steps_per_epoch,
            max(int(cfg.SWA.ANNEAL_EPOCHS), 1) * steps_per_epoch,
            str(cfg.SWA.ANNEAL_STRATEGY),
        )
    raise ValueError(f"Unknown LR scheduler {method!r}")


# ---------------------------------------------------------------------------
# optimizer builder
# ---------------------------------------------------------------------------


def build_optimizer(
    cfg,
    trainable_params,
    steps_per_epoch: int = 1,
    schedule: Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    """Build the optax chain for the *trainable* param subtree.

    Weight decay semantics follow torch: SGD couples wd into the gradient
    (add_decayed_weights), adamW decouples it; bias/norm leaves are
    excluded per WITHOUT_WD_LIST.
    """
    name = str(cfg.TRAIN.OPTIMIZER).lower()
    wd = float(cfg.TRAIN.WD)
    momentum = float(cfg.TRAIN.MOMENTUM)
    if schedule is None:
        schedule = build_lr_schedule(cfg, steps_per_epoch)

    wd_mask = no_weight_decay_mask(
        trainable_params, cfg.TRAIN.WITHOUT_WD_LIST
    )

    chain = []
    if float(cfg.TRAIN.CLIP_GRAD_NORM) > 0.0:
        chain.append(optax.clip_by_global_norm(float(cfg.TRAIN.CLIP_GRAD_NORM)))

    if name == "sgd":
        if wd:
            chain.append(
                optax.masked(optax.add_decayed_weights(wd), wd_mask)
            )
        if bool(cfg.TRAIN.LARC):
            chain.append(larc(learning_rate=float(cfg.TRAIN.LR)))
        if momentum:
            chain.append(
                optax.trace(
                    decay=momentum, nesterov=bool(cfg.TRAIN.NESTEROV)
                )
            )
    elif name == "adam":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
        if wd:
            chain.append(
                optax.masked(optax.add_decayed_weights(wd), wd_mask)
            )
    elif name in ("adamw", "timm"):
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
        if wd:
            chain.append(
                optax.masked(optax.add_decayed_weights(wd), wd_mask)
            )
    elif name == "rmsprop":
        chain.append(
            optax.scale_by_rms(decay=float(cfg.TRAIN.GAMMA1), eps=1e-8)
        )
        if wd:
            chain.append(
                optax.masked(optax.add_decayed_weights(wd), wd_mask)
            )
        if momentum:
            chain.append(optax.trace(decay=momentum))
    else:
        raise ValueError(f"Unknown optimizer {name!r}")

    if bool(cfg.TRAIN.TWO_LR):
        # backbone gets 0.1x lr (optim/build.py:102-117)
        bmask = backbone_lr_mask(trainable_params)
        chain.append(
            optax.masked(optax.scale(0.1), bmask)
        )

    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)

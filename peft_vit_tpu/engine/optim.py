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
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """LARC (lib/optim/LARC.py:82-109), exact reference semantics —
    pinned against the executed reference in tests/test_refexec_engine.py.

    LARC absorbs the optimizer's weight decay: per parameter,
        adaptive = trust * ||p|| / (||g|| + ||p||*wd + eps)
    (note: ||g|| of the RAW gradient), clip mode scales by
    min(adaptive/lr, 1), and the update becomes (g + wd*p) * scale.
    When either norm is zero the gradient passes through untouched and
    wd is NOT applied (the reference skips the whole branch).
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
            adaptive = trust_coefficient * pn / (
                gn + pn * weight_decay + eps
            )
            if clip:
                s = jnp.minimum(adaptive / learning_rate, 1.0)
            else:
                s = adaptive
            active = (pn > 0) & (gn > 0)
            out = (g + weight_decay * p) * s
            return jnp.where(active, out, g)

        updates = jax.tree_util.tree_map(scale, updates, params)
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# weight-decay / lr grouping masks
# ---------------------------------------------------------------------------

_NO_WD_DEFAULT = ("bias", "/ln_", "norm", "bn", "class_embedding",
                  "positional_embedding", "logit_scale")


def no_weight_decay_mask(params, without_wd_list=()) -> Dict:
    """True where weight decay applies.  Mirrors the reference `set_wd`
    (lib/optim/build.py:19-88): bias / LayerNorm / BatchNorm / GroupNorm
    params get no decay, and 'depthwise' excludes depthwise-conv kernels —
    detected by shape (HWIO with in_features/groups == 1), since our
    depthwise convs are named conv_dw/get_v rather than 'depthwise'."""
    keys = tuple(without_wd_list) or _NO_WD_DEFAULT
    depthwise = "depthwise" in keys
    flat = traverse_util.flatten_dict(params, sep="/")

    def decays(k, v):
        if any(s in k.lower() for s in keys):
            return False
        if (
            depthwise
            and getattr(v, "ndim", 0) == 4
            and v.shape[2] == 1
            and v.shape[3] > 1
        ):
            return False
        return True

    # None leaves (peft.split_params holes) stay None so the mask tree
    # matches the param tree structure under jax/optax flattening.
    mask = {
        k: (None if v is None else decays(k, v))
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
    warmup_method: str = "linear",
) -> optax.Schedule:
    """WarmupCosineLR (lib/scheduler/warmup_lr.py:59-135, detectron2 port).

    Exact reference semantics (pinned by the executed-reference fixture in
    tests/test_refexec_engine.py): the warmup factor MULTIPLIES a cosine
    that runs from iteration 0 —
        lr(t) = wf(t) * base * 0.5 * (1 + cos(pi * t / total))
    with wf(t) = warmup_factor*(1-a) + a (linear, a = t/warmup) or
    warmup_factor (constant) while t < warmup, else 1.  This differs from
    the more common "linear warmup then offset cosine" by O(warmup/total).
    end_lr extends the reference (0 there) as the cosine floor.
    """

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = jnp.asarray(max(warmup_steps, 1), jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(count < warmup_steps, warmup_factor, 1.0)
        else:
            alpha = count / warm
            wf = jnp.where(
                count < warmup_steps,
                warmup_factor * (1 - alpha) + alpha,
                1.0,
            )
        cos = end_lr + 0.5 * (base_lr - end_lr) * (
            1.0 + jnp.cos(jnp.pi * count / max(total_steps, 1))
        )
        return wf * cos

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
        if bool(cfg.TRAIN.LARC):
            # LARC absorbs the weight decay (LARC.py:85-104): the trust
            # ratio sees the raw ||g|| with ||p||*wd in the denominator,
            # so wd must NOT be pre-added to the gradient here.
            if wd:
                inv_mask = jax.tree_util.tree_map(
                    lambda m: None if m is None else not m, wd_mask
                )
                chain.append(
                    optax.masked(
                        larc(
                            learning_rate=float(cfg.TRAIN.LR),
                            weight_decay=wd,
                        ),
                        wd_mask,
                    )
                )
                chain.append(
                    optax.masked(
                        larc(learning_rate=float(cfg.TRAIN.LR)), inv_mask
                    )
                )
            else:
                chain.append(larc(learning_rate=float(cfg.TRAIN.LR)))
        elif wd:
            chain.append(
                optax.masked(optax.add_decayed_weights(wd), wd_mask)
            )
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

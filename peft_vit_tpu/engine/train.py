"""Train/eval engine.

Functional re-expression of the reference per-method engines
(``train_task`` / ``train_one`` / ``validate`` — evaluation/
adapter_tuning_clip.py:228-377, duplicated ~20x there, written once here).

Key TPU-native properties:

* The loss differentiates ONLY the trainable subtree (``peft.split_params``)
  — frozen-backbone VJPs are never built, and with ``TPU.REMAT`` the frozen
  activations are rematerialized instead of stored.
* ``lr`` and ``wd`` are *traced scalars* inside one compiled step, so every
  cell of the reference's lr x wd sweep reuses a single executable — and
  the whole sweep can be vmapped over cells (engine/sweep.py).
* Few-shot datasets are device-resident arrays; an epoch is a lax.scan over
  a shuffled index matrix, not a host DataLoader.

The inline optimizer implements the reference few-shot recipe exactly:
SGD + momentum 0.9 + nesterov + coupled weight decay (torch.optim.SGD
semantics), with the step-decay schedule of adjust_learning_rate
(adapter_tuning_clip.py:380-386).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..peft.masks import merge_params

# per-example criterion: (logits (B, C) fp32, target (B,) or (B, C)) -> (B,)
PerExampleCriterion = Callable[[jax.Array, jax.Array], jax.Array]


def ce_per_example(logits: jax.Array, target: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    if target.ndim == 1:
        ce = -jnp.take_along_axis(
            logp, jnp.maximum(target, 0)[:, None], axis=-1
        )[:, 0]
        # negative labels (unannotated/corrupt data) must never silently
        # wrap to the last class via take_along_axis — poison the loss so
        # the every-step NaN guard aborts with a forensic dump
        return jnp.where(target < 0, jnp.inf, ce)
    return -jnp.sum(target.astype(jnp.float32) * logp, axis=-1)


def bce_per_example(logits: jax.Array, target: jax.Array) -> jax.Array:
    """BCEWithLogits mean-over-classes per example (multilabel datasets)."""
    t = target.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(t * log_p + (1.0 - t) * log_np, axis=-1)


class SgdState(NamedTuple):
    momentum: Any


class TrainCellState(NamedTuple):
    """State for one sweep cell (trainable subtree + SGD momentum + the
    head channel-BN running statistics when TRAIN.CHANNEL_BN is on —
    the reference's ``channel_bn`` lives on the Classifier and so gets a
    fresh copy per sweep cell, adapter_tuning_clip.py:124-130,231)."""

    trainable: Any
    opt: SgdState
    step: jax.Array
    bn: Any = None  # batch_stats collection (or None)


def init_cell_state(trainable, bn=None) -> TrainCellState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, trainable)
    return TrainCellState(
        trainable=trainable,
        opt=SgdState(zeros),
        step=jnp.zeros((), jnp.int32),
        bn=bn,
    )


def sgd_update(
    grads,
    state: TrainCellState,
    lr: jax.Array,
    wd: jax.Array,
    momentum: float = 0.9,
    nesterov: bool = True,
    lr_scale=None,
) -> TrainCellState:
    """torch.optim.SGD: g += wd*p; buf = mu*buf + g;
    step uses g + mu*buf when nesterov else buf.

    lr_scale: optional per-leaf multiplier pytree — TRAIN.TWO_LR uses 0.1
    on backbone leaves (optim/build.py:102-117)."""
    buf_new = jax.tree_util.tree_map(
        lambda g, p, b: momentum * b + (g + wd * p),
        grads,
        state.trainable,
        state.opt.momentum,
    )

    def step_of(g, p, b):
        return (g + wd * p) + momentum * b if nesterov else b

    if lr_scale is None:
        p_new = jax.tree_util.tree_map(
            lambda g, p, b: p - lr * step_of(g, p, b),
            grads,
            state.trainable,
            buf_new,
        )
    else:
        p_new = jax.tree_util.tree_map(
            lambda g, p, b, s: p - (lr * s) * step_of(g, p, b),
            grads,
            state.trainable,
            buf_new,
            lr_scale,
        )
    return state._replace(
        trainable=p_new, opt=SgdState(buf_new), step=state.step + 1
    )


def step_decay_lr(base_lr, epoch, schedule):
    """adjust_learning_rate (adapter_tuning_clip.py:380-386)."""
    lr = jnp.asarray(base_lr, jnp.float32)
    for m in schedule:
        lr = jnp.where(epoch >= m, lr * 0.1, lr)
    return lr


def make_epoch_fn(
    apply_fn,
    criterion: PerExampleCriterion,
    batch_size: int,
    momentum: float = 0.9,
    nesterov: bool = True,
    lr_scale=None,
    has_bn: bool = False,
):
    """One training epoch over device-resident arrays as a lax.scan.

    x: (n, ...) with n a multiple of batch_size (see pad_dataset); `valid`
    masks padded rows out of the loss.

    With ``has_bn`` the model carries a mutable ``batch_stats`` collection
    (the head channel_bn and/or live-BN towers): ``apply_fn`` must then
    accept ``mutable=`` and the step threads ``state.bn`` through each
    batch exactly like torch's train-mode BN (normalize with batch stats,
    blend running stats in place).
    """

    def weighted_loss(trainable, frozen, bn, bx, by, bv):
        params = merge_params(trainable, frozen)
        if has_bn:
            logits, upd = apply_fn(
                {"params": params, "batch_stats": bn},
                bx,
                True,
                mutable=["batch_stats"],
            )
            new_bn = upd["batch_stats"]
        else:
            logits = apply_fn({"params": params}, bx, True)
            new_bn = bn
        per = criterion(logits.astype(jnp.float32), by)
        w = bv.astype(jnp.float32)
        loss = jnp.sum(per * w) / jnp.clip(jnp.sum(w), 1.0)
        return loss, new_bn

    grad_fn = jax.value_and_grad(weighted_loss, has_aux=True)

    def epoch_fn(state: TrainCellState, frozen, x, y, valid, perm, lr, wd):
        nb = x.shape[0] // batch_size
        idxs = perm.reshape(nb, batch_size)

        def body(st, idx):
            bx = jnp.take(x, idx, axis=0)
            by = jnp.take(y, idx, axis=0)
            bv = jnp.take(valid, idx, axis=0)
            (loss, new_bn), grads = grad_fn(
                st.trainable, frozen, st.bn, bx, by, bv
            )
            st = sgd_update(
                grads, st, lr, wd, momentum, nesterov, lr_scale
            )
            return st._replace(bn=new_bn), loss

        state, losses = jax.lax.scan(body, state, idxs)
        return state, jnp.mean(losses)

    return epoch_fn


def make_eval_fn(apply_fn, batch_size: int, has_bn: bool = False):
    """Batched inference over a device-resident array: returns logits.

    With ``has_bn`` the eval runs on RUNNING statistics (torch
    ``model.eval()`` semantics — the sweep's per-epoch ``validate``)."""

    def eval_fn(trainable, frozen, x, bn=None):
        params = merge_params(trainable, frozen)
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = bn
        nb = x.shape[0] // batch_size

        def body(_, bx):
            return None, apply_fn(variables, bx, False)

        _, logits = jax.lax.scan(
            body, None, x.reshape(nb, batch_size, *x.shape[1:])
        )
        return logits.reshape(nb * batch_size, -1)

    return eval_fn


class ArrayTask(NamedTuple):
    """A device-resident classification task (few-shot scale), padded to
    whole batches."""

    x_train: jax.Array
    y_train: jax.Array
    valid_train: jax.Array
    x_val: jax.Array
    y_val: jax.Array
    valid_val: jax.Array


def pad_dataset(x: np.ndarray, y: np.ndarray, batch: int):
    """Pad (x, y) to a multiple of `batch`; returns (x, y, valid).

    Pad rows CYCLE the dataset (row i % n) rather than repeating row 0:
    the loss masks them out either way, but with TRAIN.CHANNEL_BN the
    train-mode batch statistics see every row in the batch, and cycled
    padding keeps those statistics distributed like the data (the
    reference's last partial batch computes BN stats on real rows only)."""
    n = x.shape[0]
    m = max(1, -(-n // batch)) * batch
    if m == n:
        return x, y, np.ones(n, bool)
    reps = np.concatenate(
        [np.arange(n), np.arange(m - n) % n]
    )
    valid = np.concatenate([np.ones(n, bool), np.zeros(m - n, bool)])
    return x[reps], y[reps], valid


def make_array_task(
    x_train, y_train, x_val, y_val, batch_size: int
) -> ArrayTask:
    xt, yt, vt = pad_dataset(
        np.asarray(x_train), np.asarray(y_train), batch_size
    )
    xv, yv, vv = pad_dataset(np.asarray(x_val), np.asarray(y_val), batch_size)
    return ArrayTask(
        jnp.asarray(xt),
        jnp.asarray(yt),
        jnp.asarray(vt),
        jnp.asarray(xv),
        jnp.asarray(yv),
        jnp.asarray(vv),
    )


def masked_accuracy(logits, y, valid) -> jax.Array:
    """Top-1 accuracy in percent over valid rows (reference `accuracy`,
    adapter_tuning_clip.py:389-403)."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == y) & valid
    return 100.0 * jnp.sum(correct) / jnp.clip(jnp.sum(valid), 1)

"""Sharded (pjit/GSPMD) training step.

The multi-chip analog of the reference's DDP step (lib/core/function.py:
46-170): batch sharded over the ``data`` mesh axis, params sharded by the
tensor-parallel rules (replicated when model=1).  Gradient all-reduce is
implicit — GSPMD inserts ICI collectives where the sharded batch meets
replicated params, exactly where DDP called NCCL allreduce.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..engine.train import PerExampleCriterion, TrainCellState, sgd_update
from ..peft.masks import merge_params
from .mesh import batch_sharding, param_shardings, replicated


def make_sharded_train_step(
    apply_fn,
    criterion: PerExampleCriterion,
    mesh: Mesh,
    momentum: float = 0.9,
    nesterov: bool = True,
    donate: bool = True,
    zero1: bool = False,
):
    """Returns (train_step, place) where

    * ``train_step(state, frozen, x, y, lr, wd) -> (state, loss)`` is a
      jitted SPMD program over `mesh`;
    * ``place(state, frozen)`` device-puts state/frozen with the mesh's
      param shardings (tensor-parallel where rules apply).
    * ``zero1=True`` shards the momentum buffers over the data axis
      (ZeRO-1: GSPMD lowers the gradient all-reduce to reduce-scatter +
      all-gather around the sharded optimizer update).
    """

    def loss_fn(trainable, frozen, x, y):
        params = merge_params(trainable, frozen)
        logits = apply_fn({"params": params}, x, True)
        per = criterion(logits.astype(jnp.float32), y)
        return jnp.mean(per)

    grad_fn = jax.value_and_grad(loss_fn)

    bsh = batch_sharding(mesh)
    rep = replicated(mesh)

    @functools.partial(
        jax.jit,
        donate_argnums=(0,) if donate else (),
        in_shardings=(None, None, bsh, bsh, rep, rep),
        out_shardings=(None, rep),
    )
    def train_step(state: TrainCellState, frozen, x, y, lr, wd):
        loss, grads = grad_fn(state.trainable, frozen, x, y)
        new_state = sgd_update(grads, state, lr, wd, momentum, nesterov)
        return new_state, loss

    def place(state: TrainCellState, frozen):
        from .mesh import shard_tree_like, zero_param_shardings

        tsh = param_shardings(mesh, state.trainable)
        fsh = param_shardings(mesh, frozen)
        osh = (
            zero_param_shardings(mesh, state.opt.momentum)
            if zero1
            else tsh
        )
        state = TrainCellState(
            trainable=shard_tree_like(state.trainable, tsh),
            opt=type(state.opt)(
                shard_tree_like(state.opt.momentum, osh)
            ),
            step=jax.device_put(state.step, rep),
        )
        frozen = shard_tree_like(frozen, fsh)
        return state, frozen

    return train_step, place


def make_sharded_eval_step(apply_fn, mesh: Mesh):
    bsh = batch_sharding(mesh)

    @functools.partial(
        jax.jit, in_shardings=(None, None, bsh), out_shardings=bsh
    )
    def eval_step(trainable, frozen, x):
        params = merge_params(trainable, frozen)
        return apply_fn({"params": params}, x, False)

    return eval_step

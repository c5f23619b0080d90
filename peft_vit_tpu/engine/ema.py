"""EMA and SWA as pure pytree transforms.

Reference: full_shot/main/lib/utils/ema.py:7-79 (shadow-dict blend per step,
assign/resume swap for eval) and tools/train.py:125-287 + tools/
swa_finetune.py (torch.optim.swa_utils AveragedModel + SWALR).

Functional equivalents: state pytrees updated inside the jitted train step.
EMA/SWA track only the *trainable* subtree — blending frozen params with
themselves is a no-op the reference pays for and we don't.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any  # pytree matching the tracked params
    decay: jax.Array  # scalar


def ema_init(params, decay: float) -> EmaState:
    # copy (not alias) so donating the train state never donates the same
    # buffer twice
    return EmaState(
        shadow=jax.tree_util.tree_map(jnp.copy, params),
        decay=jnp.asarray(decay, jnp.float32),
    )


def ema_update(state: EmaState, params) -> EmaState:
    """shadow = decay * shadow + (1 - decay) * param (lib/utils/ema.py:35)."""
    d = state.decay
    shadow = jax.tree_util.tree_map(
        lambda s, p: d * s + (1.0 - d) * p.astype(s.dtype),
        state.shadow,
        params,
    )
    return state._replace(shadow=shadow)


class SwaState(NamedTuple):
    average: Any
    count: jax.Array  # number of models averaged


def swa_init(params) -> SwaState:
    return SwaState(
        average=jax.tree_util.tree_map(jnp.copy, params),
        count=jnp.asarray(0, jnp.int32),
    )


def swa_update(state: SwaState, params) -> SwaState:
    """Running equal-weight average (torch AveragedModel semantics)."""
    n = state.count
    avg = jax.tree_util.tree_map(
        lambda a, p: (a * n + p.astype(a.dtype)) / (n + 1),
        state.average,
        params,
    )
    return SwaState(average=avg, count=n + 1)


def swalr_schedule(
    base_lr: float,
    swa_lr: float,
    begin_step: int,
    anneal_steps: int,
    strategy: str = "cos",
):
    """SWALR: anneal from the running lr to swa_lr over anneal_steps after
    begin_step (SWA.LR_RATIO/ANNEAL_* config keys)."""

    def schedule(count):
        t = jnp.clip(
            (count - begin_step) / max(anneal_steps, 1), 0.0, 1.0
        )
        if strategy == "cos":
            f = 0.5 * (1.0 + jnp.cos(jnp.pi * (1.0 - t)))
        else:
            f = t
        return base_lr + (swa_lr - base_lr) * f

    return schedule

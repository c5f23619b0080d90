"""DropBlock regularization (Ghiasi et al. 2018), TPU-native.

Reference semantics reproduced from full_shot lib/layers/dropblock.py:
28-75 (consumed by cls_resnet.py / cls_resnetD.py / cls_resnetP.py when
``AUG.DROPBLOCK_KEEP_PROB < 1``):

* the *effective* keep probability anneals linearly from 1 toward the
  configured target as training progresses:
  ``kp(t) = 1 - t * (1 - keep_prob)`` (dropblock.py:29-30).  The
  reference tracks ``t = current_step / train_steps`` with a mutable
  per-module counter bumped once per model forward (cls_resnet.py:
  291-293) — and its ``init(current_step, train_steps)`` is never called
  by any tool, so ``train_steps`` stays 1 and ``t`` is the raw forward
  count (the schedule saturates after one step and keeps drifting past
  the target).  Mutable Python counters do not exist under ``jit``; here
  the trainer passes ``progress`` in [0, 1] explicitly and gets the
  *intended* linear anneal.
* drop mask: Bernoulli(gamma) at valid block centers, expanded to
  block_size x block_size squares with a stride-1 min-pool
  (dropblock.py:56-73), where
  ``gamma = (1 - kp) * W^2 / bs^2 / (W - bs + 1)^2`` and valid centers
  are ``bs//2 <= i < W - (bs-1)//2`` (requires H == W, like the
  reference).
* renormalization: ``x * mask * mask.size / mask.sum()``
  (dropblock.py:75).
* per-stage targets: stage i in 1..4 gets
  ``1 - (1 - keep_prob) / 4**(4 - i)`` (cls_resnet.py:409-419) —
  shallower stages drop less; see :func:`stage_keep_prob`.

Layout is NHWC (TPU-native); the reference is NCHW but the mask math is
layout-independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stage_keep_prob(keep_prob: float, stage: int) -> float:
    """Per-stage DropBlock target (cls_resnet.py:415 ``_keep_prob =
    1 - (1 - keep_prob) / 4.0**(4 - i)``); ``stage`` is 1-indexed like
    ``AUG.DROPBLOCK_LAYERS``."""
    return 1.0 - (1.0 - float(keep_prob)) / 4.0 ** (4 - stage)


def scheduled_keep_prob(keep_prob, progress):
    """Linear anneal 1 -> keep_prob over training (dropblock.py:29-30);
    ``progress`` may be a traced scalar."""
    p = jnp.clip(jnp.asarray(progress, jnp.float32), 0.0, 1.0)
    return 1.0 - p * (1.0 - keep_prob)


def drop_block(
    x: jax.Array,
    rng: jax.Array,
    *,
    block_size: int,
    keep_prob,
) -> jax.Array:
    """Apply one DropBlock draw to an NHWC tensor.

    ``keep_prob`` is the already-scheduled effective keep probability
    (may be a traced scalar — the mask math is fully elementwise, so the
    schedule can live inside ``jit``).  The caller owns train/eval
    gating; at ``keep_prob == 1`` the mask is all-ones and the
    renormalization is exact identity.
    """
    n, h, w, c = x.shape
    if h != w:
        raise ValueError(
            "DropBlock requires H == W (dropblock.py:35-36); "
            f"got {h}x{w}"
        )
    bs = min(int(block_size), w)
    kp = jnp.asarray(keep_prob, jnp.float32)
    gamma = (1.0 - kp) * w**2 / bs**2 / (w - bs + 1) ** 2

    i = jnp.arange(w)
    valid_1d = (i >= bs // 2) & (i < w - (bs - 1) // 2)
    # valid block centers (H, W); dropblock.py:42-53 builds the same
    # grid with meshgrid + logical_and
    valid = valid_1d[:, None] & valid_1d[None, :]

    u = jax.random.uniform(rng, x.shape, jnp.float32)
    # keep unless (valid center AND u < gamma): dropblock.py:57-59's
    # ``(1 - valid + (1 - gamma) + u) >= 1``
    center_kept = ~(valid[None, :, :, None] & (u < gamma))

    if bs == w:
        # a single center controls the whole map (dropblock.py:62-66)
        mask = jnp.min(
            center_kept.reshape(n, h * w, c).astype(jnp.float32),
            axis=1,
            keepdims=True,
        ).reshape(n, 1, 1, c) * jnp.ones((n, h, w, c), jnp.float32)
    else:
        # expand dropped centers to bs x bs blocks: min-pool stride 1,
        # padding bs//2 (dropblock.py:67-73's -maxpool(-m)).  For odd bs
        # this is the reference's symmetric pad; even bs would not
        # shape-check in the reference at all, so we keep the output
        # size W with the asymmetric (bs//2, (bs-1)//2) split.
        pad = (bs // 2, (bs - 1) // 2)
        mask = jax.lax.reduce_window(
            center_kept.astype(jnp.float32),
            1.0,
            jax.lax.min,
            window_dimensions=(1, bs, bs, 1),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), pad, pad, (0, 0)),
        )

    scale = mask.size / jnp.clip(jnp.sum(mask), 1.0)
    return (x * mask.astype(x.dtype)) * scale.astype(x.dtype)

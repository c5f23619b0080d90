"""Mixup / CutMix as pure jittable functions.

Reference: full_shot/main/lib/core/mixup.py:5-16 (beta-sampled convex mix),
lib/core/mixcut.py (bbox cut), and the timm ``Mixup`` wrapper used in
train_one_epoch (lib/core/function.py:46-80: mixup+cutmix+label smoothing
with switch probability).

Returns mixed images plus *soft* target distributions for
``soft_target_cross_entropy``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _one_hot_smooth(
    target: jax.Array, num_classes: int, smoothing: float
) -> jax.Array:
    oh = jax.nn.one_hot(target, num_classes)
    if smoothing > 0:
        oh = oh * (1.0 - smoothing) + smoothing / num_classes
    return oh


def mixup(
    rng: jax.Array,
    images: jax.Array,
    target: jax.Array,
    num_classes: int,
    alpha: float = 0.2,
    smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """Batch mixup: x = lam*x + (1-lam)*roll(x, 1) (mixup.py:5-16)."""
    lam = jax.random.beta(rng, alpha, alpha)
    perm_images = jnp.roll(images, 1, axis=0)
    mixed = lam * images + (1.0 - lam) * perm_images
    y1 = _one_hot_smooth(target, num_classes, smoothing)
    y2 = jnp.roll(y1, 1, axis=0)
    return mixed.astype(images.dtype), lam * y1 + (1.0 - lam) * y2


def cutmix(
    rng: jax.Array,
    images: jax.Array,
    target: jax.Array,
    num_classes: int,
    alpha: float = 1.0,
    smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """CutMix (mixcut.py): paste a random bbox from the rolled batch."""
    b, h, w, c = images.shape
    k_lam, k_x, k_y = jax.random.split(rng, 3)
    lam = jax.random.beta(k_lam, alpha, alpha)
    cut_ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * cut_ratio).astype(jnp.int32)
    cut_w = (w * cut_ratio).astype(jnp.int32)
    cy = jax.random.randint(k_y, (), 0, h)
    cx = jax.random.randint(k_x, (), 0, w)
    y1, y2 = jnp.clip(cy - cut_h // 2, 0, h), jnp.clip(cy + cut_h // 2, 0, h)
    x1, x2 = jnp.clip(cx - cut_w // 2, 0, w), jnp.clip(cx + cut_w // 2, 0, w)

    rows = jnp.arange(h)[None, :, None, None]
    cols = jnp.arange(w)[None, None, :, None]
    box = ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2))
    rolled = jnp.roll(images, 1, axis=0)
    mixed = jnp.where(box, rolled, images)

    area = ((y2 - y1) * (x2 - x1)).astype(jnp.float32)
    lam_adj = 1.0 - area / (h * w)
    t1 = _one_hot_smooth(target, num_classes, smoothing)
    t2 = jnp.roll(t1, 1, axis=0)
    return mixed.astype(images.dtype), lam_adj * t1 + (1.0 - lam_adj) * t2


def mixup_cutmix(
    rng: jax.Array,
    images: jax.Array,
    target: jax.Array,
    num_classes: int,
    mixup_alpha: float = 0.2,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    smoothing: float = 0.0,
) -> Tuple[jax.Array, jax.Array]:
    """timm-style: per batch, choose mixup or cutmix with switch_prob."""
    k_switch, k_op = jax.random.split(rng)
    use_cutmix = jax.random.bernoulli(k_switch, switch_prob)
    mi, mt = mixup(k_op, images, target, num_classes, mixup_alpha, smoothing)
    ci, ct = cutmix(
        k_op, images, target, num_classes, cutmix_alpha, smoothing
    )
    img = jnp.where(use_cutmix, ci, mi)
    tgt = jnp.where(use_cutmix, ct, mt)
    return img, tgt

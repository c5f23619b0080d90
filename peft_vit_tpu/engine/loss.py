"""Loss zoo.

Reference: full_shot/main/lib/core/loss.py:17-154 (softmax CE, label
smoothing, soft-target CE, focal, sigmoid multilabel BCE, multi-softmax) and
few_shot/vision_benchmark/evaluation/criterion.py:21-46 (HybridContrastive)
plus full_shot lib/models/clip_openai.py CLIPContrastive.

All functions take fp32 logits and return a scalar mean loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _as_onehot(target: jax.Array, num_classes: int) -> jax.Array:
    if target.ndim == 1:
        return jax.nn.one_hot(target, num_classes)
    return target.astype(jnp.float32)


def softmax_cross_entropy(
    logits: jax.Array, target: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """CE with integer or soft targets; optional label smoothing
    (timm LabelSmoothingCrossEntropy semantics)."""
    num_classes = logits.shape[-1]
    onehot = _as_onehot(target, num_classes)
    if label_smoothing > 0.0:
        onehot = (
            onehot * (1.0 - label_smoothing)
            + label_smoothing / num_classes
        )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(onehot * logp, axis=-1))


def soft_target_cross_entropy(
    logits: jax.Array, target: jax.Array
) -> jax.Array:
    """timm SoftTargetCrossEntropy: targets are probability vectors
    (mixup/cutmix output)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(target.astype(jnp.float32) * logp, axis=-1))


def sigmoid_multilabel_loss(
    logits: jax.Array, target: jax.Array
) -> jax.Array:
    """BCEWithLogits for multilabel datasets (few_shot train_task uses
    torch.nn.BCEWithLogitsLoss for MULTILABEL_DATASETS)."""
    t = target.astype(jnp.float32)
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32), t)
    )


def focal_loss(
    logits: jax.Array,
    target: jax.Array,
    alpha: float = 1.0,
    gamma: float = 0.5,
    normalize: bool = True,
) -> jax.Array:
    """Sigmoid focal loss, exact reference semantics (lib/core/loss.py
    FocalLoss:31-60, the class-balanced-loss formulation): per-element
    BCE-with-logits scaled by the modulator
    exp(-gamma*t*x - gamma*log1p(exp(-x))) = (1-p)^g for t=1, p^g for t=0
    computed in log space, alpha-weighted, SUM-reduced, and normalized by
    target.sum() when `normalize`.  Pinned against the executed reference
    in tests/test_refexec_engine.py."""
    x = logits.astype(jnp.float32)
    num_classes = x.shape[-1]
    t = _as_onehot(target, num_classes)
    bce = optax.sigmoid_binary_cross_entropy(x, t)
    if gamma == 0.0:
        modulator = 1.0
    else:
        # -log1p(exp(-x)) computed stably as log_sigmoid(x)
        modulator = jnp.exp(
            gamma * (-t * x + jax.nn.log_sigmoid(x))
        )
    loss = alpha * jnp.sum(modulator * bce)
    if normalize:
        loss = loss / jnp.clip(t.sum(), 1e-8)
    return loss


def multi_softmax_cross_entropy(
    logits: jax.Array, target: jax.Array
) -> jax.Array:
    """MultiSoftmaxCrossEntropyLoss (lib/core/loss.py:63-107, no class
    weight / no smoothing branch): sum(-t * log_softmax(x)) / t.sum() —
    note the GLOBAL normalization by the total positive count, not a
    per-row mean (rows with more positives weigh more)."""
    t = _as_onehot(target, logits.shape[-1])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.sum(-t * logp) / jnp.clip(t.sum(), 1e-8)


def multilabel_soft_margin_loss(
    logits: jax.Array, target: jax.Array
) -> jax.Array:
    """torch.nn.MultiLabelSoftMarginLoss(reduction='sum') — the full_shot
    'sigmoid' criterion (lib/core/loss.py:140-141): per-sample MEAN over
    classes of BCE-with-logits, SUMMED over the batch."""
    t = target.astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32), t)
    return jnp.sum(jnp.mean(bce, axis=-1))


def clip_contrastive_loss(
    logits_per_image: jax.Array, logits_per_text: jax.Array
) -> jax.Array:
    """Symmetric InfoNCE (clip_openai.py CLIPContrastive).

    For the multi-device global-batch variant, gather features with
    jax.lax.all_gather inside shard_map before computing logits (the analog
    of utils/comm.py gather_tensors at clip_openai.py:551-552); see
    parallel.collectives.gather_features.
    """
    n = logits_per_image.shape[0]
    labels = jnp.arange(n)
    li = softmax_cross_entropy(logits_per_image, labels)
    lt = softmax_cross_entropy(logits_per_text, labels)
    return 0.5 * (li + lt)


def hybrid_contrastive_loss(
    image_feats: jax.Array,
    text_feats: jax.Array,
    target: jax.Array,
    logit_scale: jax.Array,
) -> jax.Array:
    """HybridContrastive (criterion.py:21-46): soft-target CE in both
    directions where the target distribution marks all pairs with the same
    class label as positives."""
    img = image_feats / jnp.linalg.norm(image_feats, axis=-1, keepdims=True)
    txt = text_feats / jnp.linalg.norm(text_feats, axis=-1, keepdims=True)
    scale = jnp.exp(logit_scale)
    logits_i = scale * img @ txt.T
    t = target.reshape(-1, 1)
    same = (t == t.T).astype(jnp.float32)
    soft = same / jnp.clip(same.sum(axis=-1, keepdims=True), 1e-8)
    li = soft_target_cross_entropy(logits_i, soft)
    lt = soft_target_cross_entropy(logits_i.T, soft)
    return 0.5 * (li + lt)


def build_criterion(cfg, train: bool = True):
    """Select a loss from config (lib/core/loss.py:131-154 semantics)."""
    name = cfg.LOSS.LOSS
    smoothing = float(cfg.LOSS.LABEL_SMOOTHING)
    if name in ("softmax", "CE"):
        if train and smoothing > 0.0:
            return lambda logits, target: softmax_cross_entropy(
                logits, target, smoothing
            )
        return lambda logits, target: softmax_cross_entropy(logits, target)
    if name in ("softmax_smooth", "labelSmoothCE"):
        return lambda logits, target: softmax_cross_entropy(
            logits, target, smoothing if train else 0.0
        )
    if name in ("soft_target", "softTargetCE"):
        return soft_target_cross_entropy
    if name == "sigmoid":
        # full_shot semantics: MultiLabelSoftMarginLoss(reduction='sum')
        return multilabel_soft_margin_loss
    if name == "multilabel":
        # few_shot semantics: BCEWithLogitsLoss (mean)
        return sigmoid_multilabel_loss
    if name == "focal":
        alpha = float(cfg.LOSS.FOCAL.ALPHA)
        gamma = float(cfg.LOSS.FOCAL.GAMMA)
        normalize = bool(cfg.LOSS.FOCAL.NORMALIZE)
        return lambda logits, target: focal_loss(
            logits, target, alpha, gamma, normalize
        )
    if name in ("multi_softmax", "multiSoftmax"):
        return multi_softmax_cross_entropy
    raise ValueError(f"Unknown loss {name!r}")

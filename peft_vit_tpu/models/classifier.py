"""Classification heads over a (possibly frozen) backbone.

Reference semantics reproduced:

* EVERY few-shot driver's Classifier routes the pooled feature through
  ``channel_bn = BatchNorm1d(affine=False)`` before the linear head —
  the linear probe (evaluation/linear_classifier.py:38-55), the full
  fine-tune (full_model_finetune.py:98-101) and every PEFT driver
  (adapter_tuning_clip.py:124-130 and siblings) alike.  The BN is a
  feature standardizer: batch statistics during training, running
  statistics at eval, no learnable affine.  Wired through
  ``TRAIN.CHANNEL_BN`` (default on for the few-shot driver; the
  full_shot finetune tools carry a bare Linear head,
  tools/finetune_lora.py:173, so the full-shot trainer leaves it off).
* forward order is BN -> optional L2 normalize -> Linear
  (full_model_finetune.py:173-181: ``channel_bn(feature)`` then
  ``F.normalize`` under NORMALIZE_VISUAL_FEATURE, then ``layers``).
* head init from text-encoder zero-shot weights (:105-135) is done in
  ``models.factory.init_head_from_text``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FeatureBatchNorm(nn.Module):
    """BatchNorm1d(affine=False) over feature vectors (B, D), with
    torch-EXACT running statistics (pinned against the executed
    reference probe in tests/test_refexec_engine.py): normalization uses
    the biased batch variance, but running_var blends the UNBIASED batch
    variance (n/(n-1)) at torch's momentum convention
    new = (1 - m) * old + m * batch with m = 0.1 — flax's nn.BatchNorm
    blends the biased variance, which skews the eval-mode statistics the
    probe validates with."""

    momentum: float = 0.1  # torch convention: weight of the NEW batch
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, use_running_average: bool = True
    ) -> jax.Array:
        d = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "bn_mean", lambda: jnp.zeros(d, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "bn_var", lambda: jnp.ones(d, jnp.float32)
        )
        x32 = x.astype(jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = x.shape[0]
            mean = jnp.mean(x32, axis=0)
            var = jnp.mean((x32 - mean) ** 2, axis=0)  # biased, for norm
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y.astype(self.dtype)


class ClassifierHead(nn.Module):
    """channel_bn (optional) -> Linear head."""

    num_classes: int
    use_bn: bool = False
    normalize_input: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, feats: jax.Array, train: bool = False
    ) -> jax.Array:
        x = feats.astype(self.dtype)
        # reference order (full_model_finetune.py:173-181): channel_bn
        # FIRST, then the optional L2 normalize, then the linear head
        if self.use_bn:
            x = FeatureBatchNorm(name="channel_bn", dtype=self.dtype)(
                x, use_running_average=not train
            )
        if self.normalize_input:
            x = x / jnp.clip(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12
            )
        return nn.Dense(
            self.num_classes,
            name="head",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class ContrastiveClassifier(nn.Module):
    """Image tower + trainable logit scale against a frozen class-text
    feature bank.

    Reference: linear_classifier_contrast.py Classifier (:62-98) — text
    transformer frozen, fresh ``logit_scale = nn.Parameter(ones([]))``.
    TPU-native re-design: the text tower is frozen, so the per-class text
    features are precomputed ONCE (engine.zeroshot.extract_text_features)
    instead of re-encoded every step; the model emits (B, C) pair logits
    ``exp(logit_scale) * feats @ text^T``.  The hybrid-contrastive train
    criterion recovers the (B, B) image-text pair matrix by indexing
    columns with the batch labels; eval argmaxes over classes (the
    zero-shot-style validate at :276-344).
    """

    backbone: nn.Module
    text_features: Any  # (C, D) constant (L2-normalized)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        start_layer: int = 0,
    ) -> jax.Array:
        if start_layer > 0:  # cached-backbone path (engine/cached.py)
            feats = self.backbone(images, not train, False, start_layer)
        else:
            feats = self.backbone(images, not train)
        feats = feats.astype(jnp.float32)
        scale = self.param(
            "logit_scale", nn.initializers.ones, (), jnp.float32
        )
        txt = jnp.asarray(self.text_features, jnp.float32)
        return jnp.exp(scale) * feats @ txt.T


class ImageClassifier(nn.Module):
    """backbone -> head; the flagship PEFT fine-tuning model.

    ``backbone`` is any module returning pooled features (VisionTransformer
    or CLIP.visual via a bound submodule).
    """

    backbone: nn.Module
    num_classes: int = 10
    use_bn: bool = False
    normalize_visual: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        train: bool = False,
        start_layer: int = 0,
        progress=None,
    ) -> jax.Array:
        if start_layer > 0:
            # cached-backbone path: `images` are block-(start_layer-1)
            # tokens (engine/cached.py)
            feats = self.backbone(
                images, not train, False, start_layer
            )
        elif progress is not None:
            # DropBlock keep-prob anneal position in [0, 1] — only the
            # ResNet family accepts it (the full-shot trainer passes it
            # when AUG.DROPBLOCK_KEEP_PROB < 1)
            feats = self.backbone(images, not train, progress)
        else:
            feats = self.backbone(images, not train)
        return ClassifierHead(
            self.num_classes,
            use_bn=self.use_bn,
            normalize_input=self.normalize_visual,
            name="classifier",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(feats, train=train)

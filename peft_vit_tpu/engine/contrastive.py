"""Contrastive training paths.

Reference components reproduced:

* CLIP contrastive pre-training (full_shot tools/train_clip.py +
  lib/core/function_clip.py + clip_openai.py:380-552): symmetric InfoNCE
  over image/text features, optionally over the GLOBAL batch by
  gathering features across the data axis with gradients intact
  (GATHER_TENSORS spec; utils/comm.py:138-154).
* Contrastive fine-tune / probe (few_shot
  evaluation/linear_classifier_contrast.py:62-524 + criterion.py:21-46
  HybridContrastive): image features against per-class text features with
  same-class soft targets.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..parallel.collectives import gather_features
from ..parallel.mesh import DATA_AXIS
from .loss import clip_contrastive_loss, hybrid_contrastive_loss


def clip_contrastive_step_fn(
    encode_image: Callable,
    encode_text: Callable,
    gather: bool = False,
    axis_name: str = DATA_AXIS,
):
    """Per-shard loss fn for CLIP pre-training.

    With gather=True the logits are computed against the all-gathered
    global batch (the reference's GATHER_TENSORS path) — call inside
    shard_map over the data axis.
    """

    def loss_fn(params, images, tokens, logit_scale):
        img = encode_image(params, images)
        txt = encode_text(params, tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        if gather:
            img_all = gather_features(img, axis_name)
            txt_all = gather_features(txt, axis_name)
        else:
            img_all, txt_all = img, txt
        scale = jnp.exp(logit_scale.astype(jnp.float32))
        logits_i = scale * img_all @ txt_all.T
        return clip_contrastive_loss(logits_i, logits_i.T)

    return loss_fn


def hybrid_contrastive_step_fn(encode_image: Callable):
    """Loss fn for the contrastive fine-tune: image features vs the
    (frozen or trainable) per-class text features."""

    def loss_fn(params, text_features, images, labels, logit_scale):
        img = encode_image(params, images)
        return hybrid_contrastive_loss(
            img, text_features[labels], labels, logit_scale
        )

    return loss_fn


def contrastive_eval_logits(
    image_features: jax.Array, class_text_features: jax.Array
) -> jax.Array:
    """Classification logits = cosine vs class text embeddings
    (linear_classifier_contrast validate path)."""
    img = image_features / jnp.linalg.norm(
        image_features, axis=-1, keepdims=True
    )
    txt = class_text_features / jnp.linalg.norm(
        class_text_features, axis=-1, keepdims=True
    )
    return 100.0 * img @ txt.T

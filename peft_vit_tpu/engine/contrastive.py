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


def hybrid_contrastive_per_example(
    class_logits: jax.Array, target: jax.Array
) -> jax.Array:
    """Per-example HybridContrastive (criterion.py:21-46, i2t+t2i).

    ``class_logits`` are (B, C) scaled image-vs-class-text pair logits
    (models.ContrastiveClassifier output); the (B, B) image-text pair
    matrix of the reference's train_one (linear_classifier_contrast.py:
    258-264) is recovered as ``class_logits[:, target]`` since batch text
    j's feature is the class feature of label y_j.  Soft targets mark all
    same-class pairs positive, row-normalized (both directions)."""
    if target.ndim != 1:
        raise ValueError(
            "hybrid contrastive needs integer class targets"
        )
    pair = jnp.take(class_logits, target, axis=1)  # (B, B)
    same = (target[:, None] == target[None, :]).astype(jnp.float32)
    soft = same / jnp.clip(same.sum(axis=-1, keepdims=True), 1e-8)
    row = -jnp.sum(soft * jax.nn.log_softmax(pair, axis=-1), axis=-1)
    col = -jnp.sum(soft * jax.nn.log_softmax(pair.T, axis=-1), axis=-1)
    return 0.5 * (row + col)


def make_clip_train_step(model, tx, mesh=None, gather=False):
    """Jitted CLIP pre-training step (tools/train_clip.py +
    lib/core/function_clip.py): symmetric InfoNCE over (image, token)
    pairs; with a mesh, the batch is data-sharded and — when
    ``gather=True`` (the GATHER_TENSORS spec, clip_openai.py:551-552) —
    logits are computed against the all-gathered GLOBAL batch with local
    gradients (differentiable all_gather)."""
    import optax

    from .loss import clip_contrastive_loss

    if mesh is not None and gather:
        from jax.sharding import PartitionSpec as P

        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        def shard_loss(params, images, tokens):
            img = model.apply(
                {"params": params}, images, False,
                method=type(model).encode_image,
            )
            txt = model.apply(
                {"params": params}, tokens,
                method=type(model).encode_text,
            )
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            img_all = gather_features(img, DATA_AXIS)
            txt_all = gather_features(txt, DATA_AXIS)
            scale = jnp.exp(
                params["logit_scale"].astype(jnp.float32)
            )
            logits = scale * img_all.astype(jnp.float32) @ txt_all.astype(
                jnp.float32
            ).T
            return clip_contrastive_loss(logits, logits.T)

        import inspect

        kw = {}
        sig = inspect.signature(shard_map).parameters
        if "check_vma" in sig:
            kw["check_vma"] = False
        elif "check_rep" in sig:
            kw["check_rep"] = False

        def loss_fn(params, images, tokens):
            return shard_map(
                shard_loss,
                mesh=mesh,
                in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
                out_specs=P(),
                **kw,
            )(params, images, tokens)

    else:

        def loss_fn(params, images, tokens):
            li, lt = model.apply(
                {"params": params}, images, tokens, False
            )
            return clip_contrastive_loss(li, lt)

    def step(params, opt_state, images, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, tokens)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is not None:
        from ..parallel.mesh import batch_sharding, replicated

        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        return jax.jit(
            step,
            donate_argnums=(0, 1),
            in_shardings=(rep, rep, bsh, bsh),
        )
    return jax.jit(step, donate_argnums=(0, 1))


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

"""Trainable-parameter masks.

The reference freezes/unfreezes by substring filters on parameter names
(e.g. ``'adapter' in name`` adapter_tuning_clip.py:117, ``'bias' in n``
bitfit.py:73, ``'norm' in n`` layernorm.py:73, ``'attn' in n``
attention.py:73, ``'adapter1' in n`` lora_fix_one.py:598, ``'get_v' in n``
LePE.py:540, ``'blocks.12' in n`` transformer_classifier.py:562-567).

Here the same selections are boolean pytrees over the flax param tree,
consumed by ``optax.masked`` so optimizer state exists only for trainable
leaves, and by the train step to split (trainable, frozen) so XLA never
computes frozen gradients at all (SURVEY §7 design spine #2).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax
from flax import traverse_util

PathPredicate = Callable[[str], bool]


def _is_head(path: str) -> bool:
    return path.startswith("classifier/") or "/head/" in path or path.startswith(
        "head/"
    )


def _method_predicate(
    method: str, num_layers: int, adapter_layers=None
) -> PathPredicate:
    if method in ("none",):
        return lambda p: False
    if method == "linear":
        return lambda p: False  # head handled by train_head
    if method == "full":
        # full fine-tune trains everything except the text tower
        # (full_model_finetune.py:80-93 freezes text/*).
        return lambda p: not p.startswith("text/")
    if method == "bitfit":
        return lambda p: p.endswith("/bias") and not p.startswith("text/")
    if method == "layernorm":
        return lambda p: (
            ("/ln_" in p or "norm" in p)
            and not p.startswith("text/")
            and "adapter_norm" not in p
        )
    if method == "attention":
        return lambda p: "/attn/" in p and not p.startswith("text/")
    if method == "lora":
        return lambda p: "adapter" in p
    if method == "lora_fix_one":
        return lambda p: "adapter1" in p
    if method in ("lora_moe", "lora_adapter", "lora_drop_adapter"):
        return lambda p: "adapter" in p or "moe" in p
    if method == "lora_compacter":
        return lambda p: "adapter" in p or "compacter" in p
    if method == "first_attention":
        # finetune_1st_attention.py:169: 'blocks.1.attn'
        return lambda p: "blocks_1/attn" in p
    if method == "first_mlp":
        # finetune_1st_mlp.py:171: 'blocks.1.mlp'
        return lambda p: "blocks_1/mlp" in p
    if method == "adapter":
        return lambda p: "/adapter/" in p
    if method == "adapterdrop":
        # Only executing adapters train.  The reference marks EVERY
        # block's adapter trainable (adapterdrop.py), but skipped blocks
        # receive exactly zero gradient (their outputs are unused), so
        # narrowing the mask is mathematically identical — and unlocks
        # the cached-backbone sweep (engine/cached.py).
        if adapter_layers:
            frags = tuple(f"blocks_{i}/adapter/" for i in adapter_layers)
            return lambda p: any(f in p for f in frags)
        return lambda p: "/adapter/" in p
    if method == "compacter":
        return lambda p: "compacter" in p
    if method == "kadaptation":
        return lambda p: bool(
            re.search(r"(phm_rule|W_left\d|W_right\d|phmb)", p)
        )
    if method == "rpb":
        return lambda p: "relative_position_bias_table" in p
    if method == "lepe":
        return lambda p: "get_v" in p
    if method == "transformer_probe":
        return lambda p: f"blocks_{num_layers}/" in p
    if method == "vpt":
        return lambda p: "prompt_embeddings" in p
    if method == "finetune_contrast":
        # linear_classifier_contrast.py:73-86: text tower frozen; image
        # tower + fresh logit_scale train
        return lambda p: not p.startswith("text/")
    if method == "linear_probe_contrast":
        # TRAIN.FREEZE_IMAGE_BACKBONE freezes conv1/ln_pre/transformer
        # (:78-80) — ln_post, proj, class/positional embeddings and
        # logit_scale stay trainable
        return lambda p: (
            p.endswith("logit_scale")
            or "ln_post" in p
            or p.endswith("backbone/proj")
            or "cls_token" in p
            or "class_embedding" in p
            or "pos_embed" in p
            or "positional_embedding" in p
        )
    if method == "intrinsic":
        # the intrinsic vector lives outside the model pytree; inside the
        # model nothing trains except the head
        return lambda p: False
    raise ValueError(f"No trainable filter for method {method!r}")


def build_mask(
    params: Dict[str, Any],
    method: str,
    num_layers: int = 12,
    train_head: bool = True,
    extra_regex: str = "",
    adapter_layers=None,
) -> Dict[str, Any]:
    """Boolean pytree: True = trainable, matching `params` structure."""
    pred = _method_predicate(method, num_layers, adapter_layers)
    extra = re.compile(extra_regex) if extra_regex else None
    flat = traverse_util.flatten_dict(params, sep="/")
    mask = {}
    for path in flat:
        m = pred(path)
        if train_head and _is_head(path):
            m = True
        if extra is not None and extra.search(path):
            m = True
        mask[path] = m
    return traverse_util.unflatten_dict(mask, sep="/")


def split_params(params, mask):
    """Partition params into (trainable, frozen) trees with None holes."""
    train = jax.tree_util.tree_map(
        lambda p, m: p if m else None,
        params,
        mask,
        is_leaf=lambda x: x is None,
    )
    frozen = jax.tree_util.tree_map(
        lambda p, m: None if m else p,
        params,
        mask,
        is_leaf=lambda x: x is None,
    )
    return train, frozen


def merge_params(train, frozen):
    return jax.tree_util.tree_map(
        lambda t, f: t if f is None else f,
        train,
        frozen,
        is_leaf=lambda x: x is None,
    )


def count_trainable(params, mask) -> int:
    flat_p = traverse_util.flatten_dict(params, sep="/")
    flat_m = traverse_util.flatten_dict(mask, sep="/")
    return int(sum(flat_p[k].size for k in flat_p if flat_m[k]))


def describe_mask(params, mask) -> str:
    """Human-readable list of trainable parameter paths (the analog of the
    reference's `=> name ... requires grad` log lines)."""
    flat_p = traverse_util.flatten_dict(params, sep="/")
    flat_m = traverse_util.flatten_dict(mask, sep="/")
    lines = [
        f"{k}  {tuple(flat_p[k].shape)}" for k in sorted(flat_p) if flat_m[k]
    ]
    total = count_trainable(params, mask)
    lines.append(f"Number of trainable params: {total / 1e6}M.")
    return "\n".join(lines)

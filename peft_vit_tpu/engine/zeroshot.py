"""Zero-shot evaluation + frozen-feature extraction.

Reference paths reproduced:

* ``extract_text_features`` (feature.py:350-509): per class, embed every
  template (+ optional knowledge text), L2-normalize each, average over
  templates, L2-normalize the mean.
* ``clip_zeroshot_evaluator`` (clip_zeroshot_evaluator.py:9-22):
  ``logits = 100 * img_feats @ text_feats.T`` -> metric.
* ``extract_features`` (feature.py:172-321) with the .npy-style cache of
  commands/linear_probe.py:55-90 (here .npz).
* knowledge augmentation (WordNet/Wiktionary/GPT-3): the reference appends
  external definition text to each class prompt (feature.py:361-427).  The
  offline sources are pre-extracted TSV/JSON dicts; `knowledge_text` reads
  them when configured and present.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prompts import class_map, template_map
from ..data.tokenizer import tokenize
from .metrics import get_metric

logger = logging.getLogger(__name__)


def knowledge_text(cfg, dataset: str, classname: str) -> str:
    """External knowledge suffix for a class (empty when disabled)."""
    k = cfg.KNOWLEDGE
    parts: List[str] = []
    for flag, path_key, kind in (
        (
            k.WIKITIONARY.USE_DEFINITION,
            k.WIKITIONARY.WIKI_DICT_PATH,
            "wiki",
        ),
        (k.GPT3.USE_GPT3, k.GPT3.GPT3_DICT_PATH, "gpt3"),
    ):
        if not flag:
            continue
        path = os.path.join(str(path_key), f"{dataset}_knowledge.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            d = json.load(f)
        entry = d.get(classname) or {}
        txt = entry.get("def") or entry.get(kind) or ""
        if isinstance(txt, list):
            txt = " ".join(txt[: int(k.AGGREGATION.NUM_GPT3_ITEMS)])
        if txt:
            parts.append(str(txt))
    return (" " + " ".join(parts)) if parts else ""


def extract_text_features(
    encode_text: Callable[[np.ndarray], jax.Array],
    cfg,
    dataset: Optional[str] = None,
    classnames: Optional[List[str]] = None,
    context_length: Optional[int] = None,
) -> jax.Array:
    """(num_classes, embed_dim) L2-normalized zero-shot classifier."""
    dataset = dataset or cfg.DATASET.DATASET
    classnames = classnames or class_map(dataset, cfg.DATASET.ROOT)
    if classnames is None:
        raise ValueError(
            f"No class names for dataset {dataset!r}: add prompts.json "
            f"under DATASET.ROOT or register_prompts()."
        )
    templates = template_map(dataset, cfg.DATASET.ROOT)
    ctx = (
        context_length
        or getattr(encode_text, "context_length", None)
        or int(cfg.MODEL.SPEC.TEXT.CONTEXT_LENGTH)
    )

    feats = []
    for name in classnames:
        suffix = knowledge_text(cfg, dataset, name)
        texts = [t.format(name) + suffix for t in templates]
        toks = tokenize(texts, ctx)
        emb = encode_text(jnp.asarray(toks)).astype(jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        mean = emb.mean(axis=0)
        feats.append(mean / jnp.linalg.norm(mean))
    return jnp.stack(feats)


def extract_image_features(
    encode_image: Callable[[jax.Array], jax.Array],
    x: np.ndarray,
    batch_size: int = 64,
    normalize: bool = True,
    cache_path: Optional[str] = None,
) -> np.ndarray:
    """Frozen-backbone features with npz caching
    (commands/linear_probe.py:55-90 semantics)."""
    if cache_path and os.path.exists(cache_path):
        logger.info("=> load features from %s", cache_path)
        return np.load(cache_path)["feats"]
    outs = []
    n = x.shape[0]
    for i in range(0, n, batch_size):
        chunk = jnp.asarray(x[i : i + batch_size])
        f = encode_image(chunk).astype(jnp.float32)
        outs.append(np.asarray(f))
    feats = np.concatenate(outs)
    if normalize:
        feats = feats / np.clip(
            np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12, None
        )
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez_compressed(cache_path, feats=feats)
        logger.info("=> saved features to %s", cache_path)
    return feats


def clip_zeroshot_evaluator(
    image_features,
    text_features,
    labels,
    metric_name: str = "accuracy",
):
    """(result, logits) — clip_zeroshot_evaluator.py:9-22."""
    img = jnp.asarray(image_features, jnp.float32)
    txt = jnp.asarray(text_features, jnp.float32)
    logits = 100.0 * img @ txt.T
    metric = get_metric(metric_name)
    result = metric(np.asarray(logits), np.asarray(labels))
    return result, logits

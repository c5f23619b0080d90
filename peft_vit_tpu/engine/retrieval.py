"""Image<->text retrieval evaluation + ReaL-labels / valid-labels scoring.

Reference tools reproduced:

* tools/test_clip_retrieval.py — COCO-style retrieval: R@1/5/10 + median
  rank in both directions from normalized feature matrices.
* tools/test.py:119-145 — ImageNet ReaL labels (multiple acceptable labels
  per image) and the valid-label subset trick.
* image-caption benchmark plumbing (few_shot image_caption_evaluator.py)
  exercised through ``FakedImageCaptionModel`` — the reference's one
  deliberate mock (models/faked_image_caption_model.py:1-26), kept so the
  caption-benchmark plumbing is testable without a caption model.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def retrieval_metrics(
    image_feats: np.ndarray,
    text_feats: np.ndarray,
    ks: Sequence[int] = (1, 5, 10),
) -> Dict[str, float]:
    """Paired retrieval: row i of images matches row i of texts."""
    img = image_feats / np.linalg.norm(image_feats, axis=-1, keepdims=True)
    txt = text_feats / np.linalg.norm(text_feats, axis=-1, keepdims=True)
    sims = img @ txt.T  # (n, n)
    out: Dict[str, float] = {}
    for name, mat in (("i2t", sims), ("t2i", sims.T)):
        order = np.argsort(-mat, axis=1)
        ranks = np.argmax(
            order == np.arange(len(mat))[:, None], axis=1
        )
        for k in ks:
            out[f"{name}_R@{k}"] = float(100.0 * np.mean(ranks < k))
        out[f"{name}_median_rank"] = float(np.median(ranks) + 1)
    return out


def real_labels_accuracy(
    scores: np.ndarray, real_labels: List[List[int]]
) -> float:
    """ImageNet-ReaL: prediction counts as correct if it is in the image's
    acceptable-label set; images with an empty set are skipped
    (tools/test.py REAL_LABELS path)."""
    pred = scores.argmax(-1)
    hits = total = 0
    for p, labels in zip(pred, real_labels):
        if not labels:
            continue
        total += 1
        hits += int(p in labels)
    return 100.0 * hits / max(total, 1)


def valid_labels_accuracy(
    scores: np.ndarray, target: np.ndarray, valid_labels: Sequence[int]
) -> float:
    """Score only over a class subset (tools/test.py VALID_LABELS: the
    model predicts into the subset's index space)."""
    sub = scores[:, list(valid_labels)]
    pred = np.asarray(valid_labels)[sub.argmax(-1)]
    return float(100.0 * (pred == target).mean())


class FakedImageCaptionModel:
    """Canned-caption mock (reference faked_image_caption_model.py:1-26)."""

    def __init__(self, caption: str = "a photo"):
        self.caption = caption

    def generate(self, images) -> List[str]:
        n = len(images)
        return [self.caption for _ in range(n)]


def image_caption_eval(
    model, images, references: List[List[str]],
    metrics: str = "Bleu,METEOR,ROUGE_L,CIDEr",
) -> Dict[str, float]:
    """Caption benchmark with the COCO toolkit metric set (BLEU-1..4,
    METEOR, ROUGE-L, CIDEr-D, SPICE — engine.caption_metrics implements
    the published formulas natively, replacing pycocoevalcap; SPICE's
    scene graph comes from a rule-based parser, see PARITY.md).
    ``metrics``
    takes the reference's comma-separated TEST.METRIC families
    (image_caption_evaluator.py:21-29)."""
    from .caption_metrics import coco_caption_metrics

    captions = model.generate(images)
    out = coco_caption_metrics(captions, references, metrics=metrics)
    if "Bleu_1" in out:
        out["bleu1"] = out["Bleu_1"]  # round-1 key kept for compatibility
    return out

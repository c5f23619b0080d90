"""Evaluation tools (reference full_shot/main/tools/test.py:119-145,
tools/test_clip_retrieval.py, and few_shot commands/image_caption_eval.py),
parameterized as one command:

``pvt_test --mode retrieval --features feats.npz``
    COCO-style image<->text retrieval from a features npz with arrays
    ``image_feats`` (N, D) and ``text_feats`` (N, D): R@1/5/10 + median
    rank both directions.

``pvt_test --mode real --scores scores.npz --real-labels real.json``
    ImageNet-ReaL: ``scores`` (N, C) logits; ``real.json`` a list of
    acceptable-label lists (empty list = skipped image).

``pvt_test --mode valid --scores scores.npz --valid-labels 1,5,7``
    valid-label-subset accuracy (``scores.npz`` must also hold ``target``).

``pvt_test --mode caption --references refs.json [--caption "a photo"]``
    caption benchmark plumbing against the faked caption model (the
    reference's deliberate mock): BLEU-1..4, ROUGE-L, CIDEr-D.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def main(argv=None):
    from ..engine.retrieval import (
        FakedImageCaptionModel,
        image_caption_eval,
        real_labels_accuracy,
        retrieval_metrics,
        valid_labels_accuracy,
    )

    p = argparse.ArgumentParser(description="retrieval / ReaL / caption eval")
    p.add_argument(
        "--mode",
        required=True,
        choices=["retrieval", "real", "valid", "caption"],
    )
    p.add_argument("--features", default=None, help="npz for retrieval")
    p.add_argument("--scores", default=None, help="npz with scores/target")
    p.add_argument("--real-labels", default=None, help="json label lists")
    p.add_argument("--valid-labels", default=None, help="comma class ids")
    p.add_argument("--references", default=None, help="json caption refs")
    p.add_argument("--caption", default="a photo")
    p.add_argument(
        "--metrics",
        default="Bleu,METEOR,ROUGE_L,CIDEr",
        help="comma-separated caption metric families (TEST.METRIC)",
    )
    args = p.parse_args(argv)

    if args.mode == "retrieval":
        d = np.load(args.features)
        out = retrieval_metrics(d["image_feats"], d["text_feats"])
    elif args.mode == "real":
        scores = np.load(args.scores)["scores"]
        real = json.load(open(args.real_labels))
        out = {"real_top1": real_labels_accuracy(scores, real)}
    elif args.mode == "valid":
        d = np.load(args.scores)
        labels = [int(v) for v in args.valid_labels.split(",")]
        out = {
            "valid_top1": valid_labels_accuracy(
                d["scores"], d["target"], labels
            )
        }
    else:  # caption
        refs = json.load(open(args.references))
        model = FakedImageCaptionModel(args.caption)
        out = image_caption_eval(
            model, [None] * len(refs), refs, metrics=args.metrics
        )

    print(json.dumps({k: round(float(v), 4) for k, v in out.items()}))
    return out


if __name__ == "__main__":
    main()

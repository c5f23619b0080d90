"""Model summary tool (reference full_shot/main/tools/model_summary.py +
lib/utils/modelsummary.py + the ptflops counting in tools/finetune_lora.py:58).

``pvt_model_summary --cfg experiments/vit.yaml [--method lora]`` prints a
per-leaf parameter table (shape, count, trainable/frozen), the trainable
fraction, and the exact XLA-measured FLOPs of one forward pass and of one
train-step gradient computation — the numbers come from the compiled HLO,
not an estimator.
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def summarize(cfg, method: str) -> str:
    from ..engine import ce_per_example
    from ..models.factory import build_image_classifier
    from ..peft import (
        build_mask,
        merge_params,
        spec_from_config,
        split_params,
    )
    from ..utils.summary import flops_of, param_summary

    spec = spec_from_config(cfg)
    num_classes = int(cfg.MODEL.NUM_CLASSES) or int(
        cfg.DATASET.NUM_CLASSES
    )
    model, variables, _ = build_image_classifier(
        cfg, spec, max(num_classes, 2)
    )
    params = variables["params"]
    num_layers = getattr(model.backbone, "layers", 12)
    mask = build_mask(
        params, method if method != "none" else "full", num_layers=num_layers
    )
    lines = [param_summary(params, mask)]

    size = int(cfg.TRAIN.IMAGE_SIZE[0])
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    fwd_flops = flops_of(
        lambda p, xx: model.apply({"params": p}, xx, False), params, x
    )
    lines.append(f"forward FLOPs (B=1, {size}x{size}): {fwd_flops:.4g}")

    trainable, frozen = split_params(params, mask)
    y = jnp.zeros((1,), jnp.int32)

    def loss_fn(t, xx, yy):
        p = merge_params(t, frozen)
        logits = model.apply({"params": p}, xx, True)
        return jnp.mean(ce_per_example(logits.astype(jnp.float32), yy))

    grad_flops = flops_of(jax.grad(loss_fn), trainable, x, y)
    lines.append(
        f"train-step grad FLOPs (B=1): {grad_flops:.4g} "
        f"({grad_flops / max(fwd_flops, 1): .2f}x forward; frozen-weight "
        f"dW GEMMs are never built)"
    )
    return "\n".join(lines), params, mask, num_layers


def scaling_report(
    cfg, params, mask, num_layers: int, step_ms: float, batch: int
) -> str:
    """Predicted multi-chip scaling for this config's trainable set
    (utils/scaling.py; weak scaling vs the given measured step time)."""
    from ..utils.scaling import profile_from_params, scaling_table

    size = int(cfg.TRAIN.IMAGE_SIZE[0])
    patch = int(getattr(cfg.MODEL.SPEC.VISION, "PATCH_SIZE", 16) or 16)
    seq = (size // patch) ** 2 + 1
    prof = profile_from_params(
        params,
        mask,
        step_time_s=step_ms * 1e-3,
        per_chip_batch=batch,
        seq_len=seq,
        layers=num_layers,
    )
    return "PREDICTED multi-chip scaling (weak scaling, ring collectives " \
        "over v5e ICI):\n" + scaling_table(prof)


def main(argv=None):
    from ..config import get_default_config

    p = argparse.ArgumentParser(description="model summary + exact FLOPs")
    p.add_argument("--cfg", default=None)
    p.add_argument("--method", default="full")
    p.add_argument(
        "--scaling",
        nargs="?",
        const=8.7,
        type=float,
        default=None,
        metavar="STEP_MS",
        help="append the predicted multi-chip scaling table; optional "
        "value = measured single-chip ms/step (default: the BASELINE.md "
        "flagship 8.7 ms at B=16)",
    )
    p.add_argument("--batch", type=int, default=16,
                   help="per-chip batch for --scaling")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)
    cfg = get_default_config()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    out, params, mask, num_layers = summarize(cfg, args.method)
    if args.scaling is not None:
        out += "\n\n" + scaling_report(
            cfg, params, mask, num_layers, args.scaling, args.batch
        )
    print(out)
    return out


if __name__ == "__main__":
    main()

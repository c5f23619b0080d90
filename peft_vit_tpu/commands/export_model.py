"""Export a (PEFT-tuned) classifier as a portable serving artifact.

``pvt_export --cfg experiments/vit.yaml --method lora \
    --checkpoint output/ds/name/checkpoints --output model.stablehlo``

Builds the model from config (grafting MODEL.PRETRAINED weights), restores
the trained PEFT subtree from an Orbax checkpoint directory when given,
and serializes the eval forward through ``jax.export`` (StableHLO,
batch-polymorphic).  ``--platforms cpu,tpu`` bakes both lowerings into one
artifact.  ``--check`` reloads the artifact in-process and asserts logits
match the live model.

The reference has no export path — a tuned model is only a
``final_state.pth`` for the training code itself (lib/utils/utils.py:
185-203); this is the deployment story the TPU rebuild adds.
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def export_main(
    cfg,
    method: str,
    output: str,
    checkpoint: str = "",
    platforms: str = "",
    check: bool = False,
) -> bytes:
    from ..engine.checkpoint import restore_checkpoint
    from ..engine.serving import export_classifier, load_exported
    from ..models.factory import build_image_classifier
    from ..peft import build_mask, merge_params, spec_from_config, split_params

    spec = spec_from_config(cfg)
    # DATASET.NUM_CLASSES (the trained head) wins over the MODEL default
    # of 1000, matching commands/train.py's head sizing
    num_classes = int(cfg.DATASET.NUM_CLASSES) or int(cfg.MODEL.NUM_CLASSES)
    model, variables, _ = build_image_classifier(
        cfg, spec, max(num_classes, 2)
    )
    params = variables["params"]
    if checkpoint:
        num_layers = getattr(model.backbone, "layers", 12)
        mask = build_mask(
            params,
            method if method != "none" else "full",
            num_layers=num_layers,
        )
        trainable, frozen = split_params(params, mask)
        restored = restore_checkpoint(checkpoint, {"trainable": trainable})
        if restored is None:
            raise FileNotFoundError(
                f"no checkpoint under {checkpoint!r}"
            )
        params = merge_params(restored["trainable"], frozen)
        variables = dict(variables, params=params)
        logger.info("=> grafted trained %s subtree from %s",
                    method, checkpoint)

    size = int(cfg.TRAIN.IMAGE_SIZE[0])
    plats = [p.strip() for p in platforms.split(",") if p.strip()] or None
    data = export_classifier(
        model, variables, size, path=output, platforms=plats
    )
    if check:
        served = load_exported(output)
        x = jnp.asarray(
            np.random.RandomState(0)
            .randn(2, size, size, 3)
            .astype(np.float32)
        )
        want = model.apply(variables, x, False)
        got = served(x)
        err = float(jnp.max(jnp.abs(got - want)))
        logger.info("=> roundtrip max |err| %.3g", err)
        if err > 1e-4:
            raise AssertionError(f"exported artifact mismatch: {err}")
        print(f"export check OK (max err {err:.3g})")
    return data


def main(argv=None):
    from ..config import get_default_config

    p = argparse.ArgumentParser(description="export serving artifact")
    p.add_argument("--cfg", default=None)
    p.add_argument("--method", default="full")
    p.add_argument("--checkpoint", default="",
                   help="Orbax checkpoint dir with the trained subtree")
    p.add_argument("--output", required=True)
    p.add_argument("--platforms", default="",
                   help="comma list, e.g. cpu,tpu (default: current)")
    p.add_argument("--check", action="store_true",
                   help="reload the artifact and compare logits")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)
    cfg = get_default_config()
    if args.cfg:
        cfg.merge_from_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    export_main(
        cfg,
        args.method,
        args.output,
        checkpoint=args.checkpoint,
        platforms=args.platforms,
        check=args.check,
    )


if __name__ == "__main__":
    main()

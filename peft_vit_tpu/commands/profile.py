"""``pvt_profile`` — per-op device profile of a train/eval step.

Reference analog: ``full_shot/main/tools/model_summary.py`` +
lib/utils/modelsummary.py give static parameter/FLOP tables; the
reference's dynamic cost answers come from the CUDA profiler.  On TPU
the equivalent is a ``jax.profiler`` xplane capture summarized through
xprof's op_profile: this command builds the configured model, runs a
few real steps on the attached device, and prints per-category and
per-fusion device time with MXU / HBM-bandwidth utilization.

Usage::

    pvt_profile --cfg experiments/vit.yaml --method lora --batch 16
    pvt_profile --mode eval --batch 64
    pvt_profile --xplane /tmp/trace/**/host.xplane.pb   # parse only

The raw trace directory is always kept (``--logdir``) so it can be
opened in TensorBoard/xprof for the full timeline view.
"""

from __future__ import annotations

import argparse
import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def build_step(cfg, method: str, batch: int, mode: str, k_chain: int):
    """A self-syncing callable running ``k_chain`` train (or eval)
    steps per dispatch on the configured model."""
    from ..engine import ce_per_example, init_cell_state, sgd_update
    from ..models.factory import build_image_classifier
    from ..peft import (
        build_mask,
        merge_params,
        spec_from_config,
        split_params,
    )

    spec = spec_from_config(cfg)
    num_classes = (
        int(cfg.MODEL.NUM_CLASSES) or int(cfg.DATASET.NUM_CLASSES) or 100
    )
    model, variables, _ = build_image_classifier(
        cfg, spec, max(num_classes, 2)
    )
    params = variables["params"]
    num_layers = getattr(model.backbone, "layers", 12)
    mask = build_mask(
        params, method if method != "none" else "full", num_layers=num_layers
    )
    trainable, frozen = split_params(params, mask)

    size = int(cfg.TRAIN.IMAGE_SIZE[0])
    rng = np.random.RandomState(0)
    dtype = jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    x = jnp.asarray(
        rng.randn(batch, size, size, 3).astype(np.float32), dtype
    )
    y = jnp.asarray(rng.randint(0, max(num_classes, 2), batch))
    # train mode profiles the production data path (bench.py / the
    # Trainer's scan dispatch): per-step uint8 batches normalized on
    # device, so the trace includes the real per-step input work
    xs_u8 = jnp.asarray(rng.randint(
        0, 256, (k_chain, batch, size, size, 3), dtype=np.uint8
    ))
    ys = jnp.asarray(
        rng.randint(0, max(num_classes, 2), (k_chain, batch))
    )
    norm_mean = jnp.asarray(cfg.INPUT.MEAN, jnp.float32) * 255.0
    norm_std = jnp.asarray(cfg.INPUT.STD, jnp.float32) * 255.0

    if mode == "eval":
        # params enter as arguments, never as closed-over constants — a
        # constant-folded weight tree bloats the serialized HLO by the
        # model's full size (and overflows relay compile payloads)

        @jax.jit
        def eval_steps(p, x):
            def body(c, _):
                logits = model.apply({"params": p}, x, False)
                return c + jnp.sum(logits.astype(jnp.float32)), None

            c, _ = jax.lax.scan(
                body, jnp.float32(0.0), None, length=k_chain
            )
            return c

        return lambda: eval_steps(params, x)

    # mirror the Trainer's int8 wiring (engine/trainer.py _frozen_qk):
    # under TPU.INT8_FWD_TRAIN the frozen kernels are quantized ONCE PER
    # RUN (outside the jitted step entirely — the tower never changes),
    # and TPU.INT8_BWD_DX adds the pre-quantized transposed kernels for
    # the SwitchBack dx backward — so the profiled step IS the
    # production step
    int8_fwd = bool(cfg.TPU.get("INT8_FWD_TRAIN", False))
    int8_bwd_dx = bool(cfg.TPU.get("INT8_BWD_DX", False))
    int8_targets = tuple(
        cfg.TPU.get("INT8_TARGETS", ["in_proj", "out_proj", "c_fc", "c_proj"])
    )
    qk0 = None
    qs0 = None
    if int8_fwd:
        from ..ops.int8 import quantize_frozen_tree

        qk0 = jax.jit(
            lambda f: quantize_frozen_tree(
                f, targets=int8_targets, bwd_dx=int8_bwd_dx
            )
        )(frozen)
        if bool(cfg.TPU.get("INT8_STATIC_ACT", False)):
            # per-run calibration, mirroring the Trainer's _qk_vars
            from ..ops.int8 import activation_scales_from_stats

            margin = float(cfg.TPU.get("INT8_CALIB_MARGIN", 1.5))

            def _calib(t, f, x):
                p = merge_params(t, f)
                xn = (
                    (x.astype(jnp.float32) - norm_mean) / norm_std
                ).astype(dtype)
                _, st = model.apply(
                    {"params": p}, xn, True, mutable=["qstats"]
                )
                return activation_scales_from_stats(
                    st["qstats"], margin=margin
                )

            qs0 = jax.jit(_calib)(trainable, frozen, xs_u8[0])

    def loss_fn(t, frozen, qk, x, y):
        p = merge_params(t, frozen)
        variables = {"params": p}
        if qk is not None:
            variables["qkernel"] = qk
            if qs0 is not None:  # TPU.INT8_STATIC_ACT
                variables["qscale"] = qs0
        logits = model.apply(variables, x, True)
        return jnp.mean(ce_per_example(logits.astype(jnp.float32), y))

    grad_fn = jax.value_and_grad(loss_fn)

    @jax.jit
    def train_steps(state, frozen, qk, xs, ys):
        def body(s, inp):
            x, y = inp
            x = (
                (x.astype(jnp.float32) - norm_mean) / norm_std
            ).astype(dtype)
            loss, grads = grad_fn(s.trainable, frozen, qk, x, y)
            return sgd_update(grads, s, 1e-3, 1e-4), loss

        state, losses = jax.lax.scan(body, state, (xs, ys))
        return state, losses[-1]

    state = init_cell_state(trainable)

    def step():
        nonlocal state
        state, loss = train_steps(state, frozen, qk0, xs_u8, ys)
        return loss

    return step


def main(argv=None):
    from ..config import get_default_config
    from ..utils.xprof import (
        capture_trace,
        format_op_profile,
        parse_op_profile,
    )

    p = argparse.ArgumentParser(
        description="per-op TPU profile of a train/eval step"
    )
    p.add_argument("--cfg", default=None)
    p.add_argument("--method", default="lora")
    p.add_argument("--mode", choices=["train", "eval"], default="train")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument(
        "--k-chain",
        type=int,
        default=8,
        help="steps per dispatch (amortizes dispatch latency)",
    )
    p.add_argument("--steps", type=int, default=3, help="traced dispatches")
    p.add_argument("--logdir", default="/tmp/pvt_profile")
    p.add_argument("--top", type=int, default=15)
    p.add_argument(
        "--xplane",
        default=None,
        help="parse an existing .xplane.pb instead of tracing",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args(argv)

    xplane = args.xplane
    if xplane is None:
        cfg = get_default_config()
        if args.cfg:
            cfg.merge_from_file(args.cfg)
        if args.opts:
            cfg.merge_from_list(args.opts)
        cfg.freeze()
        step = build_step(
            cfg, args.method, args.batch, args.mode, args.k_chain
        )
        xplane = capture_trace(step, args.logdir, steps=args.steps)
        if xplane is None:
            print(
                f"no xplane capture appeared under {args.logdir} — "
                "the profiler produced no device plane on this backend"
            )
            return None
        print(f"trace: {xplane}")
    try:
        profile = parse_op_profile(xplane)
    except RuntimeError as e:
        print(str(e))
        return None
    out = format_op_profile(profile, top=args.top)
    print(out)
    return profile


if __name__ == "__main__":
    main()

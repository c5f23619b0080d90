"""Bench matrix (BASELINE.md round 4): per-config train throughput + TF/s.

Usage (real TPU):

    python bench_matrix.py vit_b16_lora:16:32 vit_b16_full:16:32 \
        vit_b16_adapter:16:32 swin_t_full:16:16 r50_full:128:4

Each case is <config>:<batch>:<k_chain>, measured with >= 4k-image
timing windows; effective TF/s from XLA cost analysis of the jitted
step (NB cost_analysis counts the lax.scan BODY once — per-image FLOPs
are flops / batch, not / (batch * k_chain)).

Data path matches bench.py (round 4): each chained step consumes its
own batch sliced from a device-resident (K, B, H, W, C) uint8 chunk and
normalized on device in the scan body — the production Trainer's
raw-uint8 dispatch.  Transfer stays off the timed window (39 MB/s relay
tunnel rationale, BASELINE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/pvt_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import _flagship
from peft_vit_tpu.engine import ce_per_example, init_cell_state, sgd_update
from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.peft import PEFTSpec, build_mask, merge_params, split_params

DT = jnp.bfloat16

# production normalize constants (config/default.py INPUT.MEAN/STD),
# pre-scaled to the raw-uint8 range exactly like engine/trainer.py
NORM_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32) * 255.0
NORM_STD = np.asarray([0.229, 0.224, 0.225], np.float32) * 255.0


def _norm(x):
    mean = jnp.asarray(NORM_MEAN)
    std = jnp.asarray(NORM_STD)
    return ((x.astype(jnp.float32) - mean) / std).astype(DT)


def vit(spec, method):
    model = _flagship(dtype=DT, use_flash=True, remat=False,
                      softmax_fp32=False, ln_fp32=False)
    if spec is not None:
        v = VisionTransformer(
            image_size=224, patch_size=16, width=768, layers=12, heads=12,
            style="clip", output_dim=512, spec=spec, use_flash=True,
            softmax_fp32=False, ln_fp32=False, dtype=DT,
        )
        model = ImageClassifier(backbone=v, num_classes=100, dtype=DT)
    return model, method, False


def swin_t():
    from peft_vit_tpu.models.swin import SwinTransformer

    v = SwinTransformer(image_size=224, embed_dim=96, depths=(2, 2, 6, 2),
                        num_heads=(3, 6, 12, 24), use_flash=False, dtype=DT)
    return ImageClassifier(backbone=v, num_classes=100, dtype=DT), "full", False


def r50():
    from peft_vit_tpu.models.resnet import ResNet

    v = ResNet(layers=(3, 4, 6, 3), dtype=DT)
    return ImageClassifier(backbone=v, num_classes=100, dtype=DT), "full", True


CONFIGS = {
    "vit_b16_lora": lambda: vit(None, "lora"),
    "vit_b16_full": lambda: vit(None, "full"),
    "vit_b16_adapter": lambda: vit(
        PEFTSpec(method="adapter", adapter="houlsby", adapter_dim=64),
        "adapter"),
    "swin_t_full": swin_t,
    "r50_full": r50,
}

results = {}
for case in sys.argv[1:]:
    name, batch, k_chain = case.split(":")
    batch, k_chain = int(batch), int(k_chain)
    model, method, has_bn = CONFIGS[name]()
    x0 = jnp.zeros((1, 224, 224, 3), DT)
    variables = model.init(jax.random.PRNGKey(0), x0, True)
    params = variables["params"]
    bn0 = variables.get("batch_stats")
    nl = getattr(model.backbone, "layers", 12)
    nl = nl if isinstance(nl, int) else 12
    mask = build_mask(params, method, num_layers=nl)
    trainable, frozen = split_params(params, mask)

    def loss_fn(trainable, frozen, bn, x, y):
        p = merge_params(trainable, frozen)
        if has_bn:
            logits, upd = model.apply(
                {"params": p, "batch_stats": bn}, x, True,
                mutable=["batch_stats"],
            )
            return (
                jnp.mean(ce_per_example(logits.astype(jnp.float32), y)),
                upd["batch_stats"],
            )
        logits = model.apply({"params": p}, x, True)
        return jnp.mean(ce_per_example(logits.astype(jnp.float32), y)), bn

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step_fn(state, bn, frozen, xs, ys):
        def body(carry, inp):
            s, b = carry
            x, y = inp
            (loss, b), grads = grad_fn(s.trainable, frozen, b, _norm(x), y)
            return (sgd_update(grads, s, 1e-3, 1e-4), b), loss

        (state, bn), losses = jax.lax.scan(body, (state, bn), (xs, ys))
        return state, bn, losses[-1]

    jstep = jax.jit(step_fn, donate_argnums=(0, 1))
    rng = np.random.RandomState(0)
    # K distinct per-step batches, device-resident, transferred once
    # outside the timed window (bench.py rationale)
    x = jnp.asarray(rng.randint(
        0, 256, (k_chain, batch, 224, 224, 3), dtype=np.uint8))
    y = jnp.asarray(rng.randint(0, 100, (k_chain, batch)))

    # FLOPs of ONE step from cost analysis (k_chain steps per dispatch)
    lowered = jax.jit(step_fn, donate_argnums=(0, 1)).lower(
        init_cell_state(jax.tree.map(jnp.copy, trainable)), bn0, frozen,
        x, y,
    )
    cost = lowered.compile().cost_analysis()
    # XLA cost analysis counts the scan body ONCE (verified: the
    # round-4 numbers reproduce the known 71/106 GFLOP/img figures)
    flops_per_img = float(cost.get("flops", 0.0)) / batch

    state = init_cell_state(jax.tree.map(jnp.copy, trainable))
    bn = jax.tree.map(jnp.copy, bn0) if bn0 is not None else None
    state, bn, loss = jstep(state, bn, frozen, x, y)
    float(loss)
    n_disp = max(2, 4096 // (batch * k_chain))
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, bn, loss = jstep(state, bn, frozen, x, y)
    float(loss)
    dt = time.perf_counter() - t0
    rate = batch * k_chain * n_disp / dt
    tfs = rate * flops_per_img / 1e12
    results[case] = {
        "img_s": round(rate, 1),
        "gflop_per_img": round(flops_per_img / 1e9, 1),
        "eff_tf_s": round(tfs, 1),
    }
    print(json.dumps({case: results[case]}), flush=True)

print("FINAL", json.dumps(results))
os._exit(0)

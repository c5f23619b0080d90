"""Sweep-engine wall-clock bench: int8 vs bf16 through vmapped cells.

Measures VERDICT r4 #5's question on the real chip: does the int8
recipe speed up the reference's hottest workload — the lr x wd sweep
(~78 trainings/dataset, few_shot adapter_tuning_clip.py:173-225) — the
way it speeds up the single-model Trainer step (+21.6%)?

Answer (BASELINE.md round 5, "Sweep-engine int8 wall-clock"): an
honest wash.  Vmapping k cells multiplies the effective GEMM batch to
M ~ k*B*N rows, where bf16 GEMMs already sit at their large-M plateau
and the attention chains (which int8 does not touch — see the
INT8_ATTN negative) dominate the step.  The sweep's throughput lever
is the vmap itself; the int8 plumbing stays correct-and-optional
(bit-exact gates in tests/test_int8_fwd_train.py TestSweepPrequant).

Usage (real TPU):  python bench_sweep.py [patch] [epochs]
Prints one JSON line per case (bf16 / int8 per-call / int8 prequant),
timing the SECOND train_cells call (the first compiles + warms).
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

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.engine import SweepEngine, ce_per_example, make_array_task
from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.peft import PEFTSpec, build_mask, split_params
from peft_vit_tpu.ops.int8 import quantize_frozen_tree

DT = jnp.bfloat16
PATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 25


def build(int8):
    spec = PEFTSpec(method="lora", attn_delta="lora", lora_rank=4,
                    lora_alpha=128.0, lora_post_scale_q=True)
    v = VisionTransformer(image_size=224, patch_size=PATCH, width=768,
                          layers=12, heads=12, style="clip",
                          output_dim=512, spec=spec, use_flash=True,
                          softmax_fp32=False, ln_fp32=False,
                          int8_train=int8, dtype=DT)
    return ImageClassifier(backbone=v, num_classes=5, dtype=DT)


model0 = build(False)
x0 = jnp.zeros((1, 224, 224, 3), DT)
params = model0.init(jax.random.PRNGKey(0), x0)["params"]
mask = build_mask(params, "lora", num_layers=12)
_, frozen = split_params(params, mask)


def init_trainable(rng):
    t, _ = split_params(model0.init(rng, x0)["params"], mask)
    return t


rng = np.random.RandomState(0)
y = np.tile(np.arange(5), 25)
x = rng.randn(125, 224, 224, 3).astype(np.float32) * 0.3
x += np.linspace(-1, 1, 5)[y][:, None, None, None]
task = make_array_task(x[:100], y[:100], x[100:], y[100:], 32)

cfg = get_default_config()
cfg.TRAIN.BATCH_SIZE_PER_GPU = 32
cfg.TRAIN.SCHEDULE = []

WDS = list(np.logspace(-6, 0, 7))
LRS = [3e-3] * 7


def run(name, int8, prequant):
    model = build(int8)
    qk = None
    if prequant:
        qk = jax.jit(lambda f: quantize_frozen_tree(f, bwd_dx=True))(frozen)
        jax.block_until_ready(jax.tree_util.tree_leaves(qk)[0])
    eng = SweepEngine(cfg, lambda v, xx, train: model.apply(v, xx, train),
                      init_trainable, frozen, ce_per_example, qkernel=qk)
    eng.train_cells(LRS, WDS, task, EPOCHS)              # compile + warm
    t0 = time.perf_counter()
    s = eng.train_cells(LRS, WDS, task, EPOCHS, seed=1)  # timed
    dt = time.perf_counter() - t0
    print(json.dumps({"case": name, "wall_s": round(dt, 2),
                      "cells": len(LRS), "epochs": EPOCHS,
                      "best": float(np.max(s))}), flush=True)
    return dt


t_bf16 = run("bf16", False, False)
t_fb = run("int8_percall", True, False)
t_pq = run("int8_prequant", True, True)
print(json.dumps({"speedup_prequant_vs_bf16": round(t_bf16 / t_pq, 3),
                  "speedup_prequant_vs_percall": round(t_fb / t_pq, 3)}),
      flush=True)
os._exit(0)  # skip axon teardown hang in this sandbox

"""Benchmark: ViT-B/16 + LoRA fine-tuning throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N}

Baseline (BASELINE.md north star): 3,000 images/sec/chip for ViT-B/16 LoRA
fine-tuning on TPU v5e.  See BASELINE.md: the step's large GEMM fusions
run at 170-181 TF/s (86-92% of the 197 TF/s nominal bf16 peak — round-3
per-fusion xprof), and the residual 13.7% is the measured small-shape
tail (N=197 attention chains, two layout copies, softmax backward) for
which every named lever was built and measured negative.  3,000 img/s
implies 213 TF/s sustained at 71 GFLOP/img — above nominal peak; the
headline number is this part's measured limit for exact bf16 compute.

Round-4 headline configuration: TPU.INT8_FWD_TRAIN + TPU.INT8_BWD_DX —
the QLoRA-style forward (frozen tower's GEMMs int8 via per-dispatch
pre-quantized weights) PLUS the SwitchBack-style backward: dx = g @ W^T
through those frozen layers also rides the int8 MXU against the
pre-quantized transposed kernel.  Sound because the tower is frozen (no
dW exists through those GEMMs; LoRA's own dW stays exact); convergence
-gated in tests/test_int8_fwd_train.py and on chip (BASELINE.md round
4).  Measured 2,142 img/s at B=16 vs 1,939 int8-fwd-only and 1,833 bf16
(+17%); per-fusion accounting in BASELINE.md round 4.

Configuration (all measured on v5e, see BASELINE.md):
* bf16 fast path: attention scores (TPU.BF16_SOFTMAX) and LayerNorm
  statistics (TPU.BF16_LN) in bf16 — 1573 -> 1851 img/s at B=16.
* K training steps chained in one dispatch via lax.scan: the axon relay
  costs ~12 ms of host time per jit call, which at B=16 (8.6 ms/step
  device time) would otherwise dominate.
* donate_argnums on the train state: in-place param/opt-state updates.
* small per-chip batch (sweep peaks at B=16): XLA keeps the 197x197
  attention score tiles VMEM-resident below B~32; at B>=64 they spill
  and the attention chain scales superlinearly with batch.

The timed window reuses one device-resident batch DELIBERATELY: this
container's host<->device link is a ~39 MB/s relay tunnel (production
TPU hosts have PCIe), so any fresh-data variant measures the rig, not
the framework.  The input path is benchmarked separately end-to-end
(BASELINE.md "Streaming input pipeline": commands/train.py with the
native decode ring, double-buffered device transfer, and uint8 chunks
at the rig's decode/tunnel ceiling).  This bench isolates the compute
question the baseline target asks about: images/sec the chip sustains
on the ViT-B/16 LoRA train step.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the three train-step compiles dominate the
# bench's wall time over the axon relay (minutes each); repeat runs hit the
# cache and finish in the timing windows alone.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PVT_COMPILE_CACHE", "/tmp/pvt_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_IMG_S = 3000.0


def make_step(model, grad_fn, k_chain: int, int8: bool = False,
              bwd_dx: bool = False):
    from peft_vit_tpu.engine import sgd_update

    if int8:
        # TPU.INT8_FWD_TRAIN: pre-quantize the frozen tower's kernels
        # ONCE per dispatch (outside the chained-step scan) — the
        # QLoRA-style forward (ops/int8.py); backward stays bf16-exact.
        # bwd_dx (TPU.INT8_BWD_DX, SwitchBack recipe): dx = g @ W^T also
        # rides the int8 MXU against the pre-quantized TRANSPOSED kernel
        # — sound because the tower is FROZEN (no dW needed; LoRA dW is
        # exact), convergence-gated in tests/test_int8_fwd_train.py.
        from peft_vit_tpu.ops.int8 import quantize_frozen_tree

        def step_fn(state, frozen, x, y):
            qk = quantize_frozen_tree(frozen, bwd_dx=bwd_dx)

            def body(s, _):
                loss, grads = grad_fn(s.trainable, frozen, qk, x, y)
                return sgd_update(grads, s, 1e-3, 1e-4), loss

            state, losses = jax.lax.scan(
                body, state, None, length=k_chain
            )
            return state, losses[-1]

        return jax.jit(step_fn, donate_argnums=(0,))

    def step_fn(state, frozen, x, y):
        def body(s, _):
            loss, grads = grad_fn(s.trainable, frozen, x, y)
            return sgd_update(grads, s, 1e-3, 1e-4), loss

        state, losses = jax.lax.scan(body, state, None, length=k_chain)
        return state, losses[-1]

    return jax.jit(step_fn, donate_argnums=(0,))


def measure(train_step, state, frozen, batch: int, k_chain: int,
            n_disp: int, warmup: int):
    rng = np.random.RandomState(0)
    x = jnp.asarray(
        rng.randn(batch, 224, 224, 3).astype(np.float32), jnp.bfloat16
    )
    y = jnp.asarray(rng.randint(0, 100, batch))
    for _ in range(warmup):
        state, loss = train_step(state, frozen, x, y)
    float(loss)  # host fetch: the only reliable sync under the axon relay
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, loss = train_step(state, frozen, x, y)
    float(loss)
    return batch * k_chain * n_disp / (time.perf_counter() - t0), state


def main() -> None:
    from __graft_entry__ import _flagship
    from peft_vit_tpu.engine import ce_per_example, init_cell_state
    from peft_vit_tpu.peft import build_mask, merge_params, split_params

    on_tpu = jax.default_backend() == "tpu"

    model = _flagship(
        dtype=jnp.bfloat16,
        use_flash=on_tpu,
        remat=False,
        softmax_fp32=False,  # TPU.BF16_SOFTMAX
        ln_fp32=False,  # TPU.BF16_LN
    )
    x0 = jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), x0)["params"]
    mask = build_mask(params, "lora", num_layers=12)
    trainable, frozen = split_params(params, mask)

    def loss_fn(trainable, frozen, x, y):
        p = merge_params(trainable, frozen)
        logits = model.apply({"params": p}, x, True)
        return jnp.mean(ce_per_example(logits.astype(jnp.float32), y))

    grad_fn = jax.value_and_grad(loss_fn)

    img_s = 0.0
    # The int8-forward + int8-dx case (TPU.INT8_FWD_TRAIN +
    # TPU.INT8_BWD_DX, measured fastest: BASELINE.md round 4) runs FIRST
    # so a valid headline exists even if the deadline cuts the rest;
    # fwd-only int8 and bf16 B=16 are the reference points, 8 and 32
    # bracket the batch knee.  Case = (batch, k_chain, int8, bwd_dx).
    cases = (
        [
            (16, 32, True, True),
            (16, 32, True, False),
            (16, 32, False, False),
            (8, 64, False, False),
            (32, 16, False, False),
        ]
        if on_tpu
        else [(8, 2, False, False)]
    )
    # each cold compile costs minutes over the axon relay; stop launching
    # new cases past the soft deadline so one JSON line always prints
    deadline = time.perf_counter() + float(
        os.environ.get("PVT_BENCH_DEADLINE_S", "1500")
    )
    for i, (batch, k_chain, int8, bwd_dx) in enumerate(cases):
        if i > 0 and time.perf_counter() > deadline:
            break
        imodel = model
        if int8:
            imodel = _flagship(
                dtype=jnp.bfloat16,
                use_flash=on_tpu,
                remat=False,
                softmax_fp32=False,
                ln_fp32=False,
                int8_train=True,
            )

        def loss_fn_i8(trainable, frozen, qk, x, y):
            p = merge_params(trainable, frozen)
            logits = imodel.apply(
                {"params": p, "qkernel": qk}, x, True
            )
            return jnp.mean(ce_per_example(logits.astype(jnp.float32), y))

        gfn = jax.value_and_grad(loss_fn_i8) if int8 else grad_fn
        step = make_step(imodel, gfn, k_chain, int8=int8, bwd_dx=bwd_dx)
        # donated state: each case needs its own copy
        state = init_cell_state(jax.tree.map(jnp.copy, trainable))
        # >= ~4k images per timing window
        n_disp = max(2, 4096 // (batch * k_chain)) if on_tpu else 1
        rate, state = measure(
            step, state, frozen, batch, k_chain, n_disp, warmup=1
        )
        img_s = max(img_s, rate)
    print(
        json.dumps(
            {
                "metric": "vitb16_lora_train_throughput",
                "value": round(img_s, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
            }
        )
    )
    sys.stdout.flush()
    os._exit(0)  # skip axon teardown hang in this sandbox


if __name__ == "__main__":
    main()

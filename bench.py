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

Round-5 headline configuration: TPU.INT8_FWD_TRAIN + TPU.INT8_BWD_DX +
TPU.INT8_STATIC_ACT — the QLoRA-style int8 forward and SwitchBack dx
backward (round 4) with per-TENSOR STATIC activation scales calibrated
once per run: the per-row dynamic absmax chains (13% of the round-4
step at 2.9 TF/s) become saturating elementwise quantizes XLA fuses
into the activation producers.  Convergence-gated (per-epoch
recalibration + 1.5x margin; tests/test_int8_fwd_train.py
test_static_act_*).  Measured on the per-step data path below: 2,148
img/s (B=16, k=64, TPU.PATCH_EMBED_GEMM) vs 2,050 dynamic-quantize,
1,876 int8-fwd-only, 1,766 bf16 (+21.6% over bf16).  Per-fusion
accounting and the updated int8-aware roofline in BASELINE.md round 5.

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

Data path (round 4): each of the K chained steps consumes a DIFFERENT
batch, sliced from a device-resident (K, B, H, W, C) uint8 chunk and
normalized on device inside the scan body — byte-for-byte the
production Trainer's TPU.STEPS_PER_DISPATCH dispatch
(engine/trainer.py train_step_scan + the raw-uint8 normalize path), so
the timed step includes the real per-step uint8->float normalize work.
Host->device transfer stays OFF the timed path deliberately: this
container's link is a ~39 MB/s relay tunnel (production TPU hosts have
PCIe), so any fresh-transfer variant measures the rig, not the
framework.  The input path is benchmarked separately end-to-end
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

# production normalize constants (config/default.py INPUT.MEAN/STD),
# pre-scaled to the raw-uint8 range exactly like engine/trainer.py
NORM_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32) * 255.0
NORM_STD = np.asarray([0.229, 0.224, 0.225], np.float32) * 255.0


def make_step(model, grad_fn, k_chain: int, int8: bool = False,
              bwd_dx: bool = False):
    """The production dispatch shape: scan over a (K, B, ...) uint8
    chunk, each step normalizing its own batch on device — mirrors
    engine/trainer.py train_step_scan."""
    from peft_vit_tpu.engine import sgd_update

    mean = jnp.asarray(NORM_MEAN)
    std = jnp.asarray(NORM_STD)

    def norm(x):
        # normalize in f32, hand the model its compute dtype directly —
        # identical numerics to flax's internal input cast at the first
        # conv, one fewer full-resolution HBM pass
        return ((x.astype(jnp.float32) - mean) / std).astype(jnp.bfloat16)

    if int8:
        # TPU.INT8_FWD_TRAIN: the frozen tower's kernels arrive
        # PRE-QUANTIZED per RUN (qk computed once outside the timed
        # loop, exactly like the Trainer's _frozen_qk — the tower never
        # changes, so no dispatch ever requantizes) — the QLoRA-style
        # forward (ops/int8.py); backward stays bf16-exact.
        # bwd_dx (TPU.INT8_BWD_DX, SwitchBack recipe): dx = g @ W^T also
        # rides the int8 MXU against the pre-quantized TRANSPOSED kernel
        # — sound because the tower is FROZEN (no dW needed; LoRA dW is
        # exact), convergence-gated in tests/test_int8_fwd_train.py.
        def step_fn(state, frozen, qk, xs, ys):
            def body(s, inp):
                x, y = inp
                loss, grads = grad_fn(s.trainable, frozen, qk, norm(x), y)
                return sgd_update(grads, s, 1e-3, 1e-4), loss

            state, losses = jax.lax.scan(body, state, (xs, ys))
            return state, losses[-1]

        return jax.jit(step_fn, donate_argnums=(0,))

    def step_fn(state, frozen, qk, xs, ys):
        def body(s, inp):
            x, y = inp
            loss, grads = grad_fn(s.trainable, frozen, norm(x), y)
            return sgd_update(grads, s, 1e-3, 1e-4), loss

        state, losses = jax.lax.scan(body, state, (xs, ys))
        return state, losses[-1]

    return jax.jit(step_fn, donate_argnums=(0,))


def measure(train_step, state, frozen, qk, batch: int, k_chain: int,
            n_disp: int, warmup: int):
    rng = np.random.RandomState(0)
    # one device-resident (K, B, ...) uint8 chunk — K distinct batches,
    # transferred once OUTSIDE the timed window (rig rationale above)
    xs = jnp.asarray(rng.randint(
        0, 256, (k_chain, batch, 224, 224, 3), dtype=np.uint8
    ))
    ys = jnp.asarray(rng.randint(0, 100, (k_chain, batch)))
    for _ in range(warmup):
        state, loss = train_step(state, frozen, qk, xs, ys)
    float(loss)  # host fetch: the only reliable sync under the axon relay
    t0 = time.perf_counter()
    for _ in range(n_disp):
        state, loss = train_step(state, frozen, qk, xs, ys)
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
    # so a valid headline exists even if the deadline cuts the rest; it
    # also takes TPU.PATCH_EMBED_GEMM and k=64 — both re-measured as
    # wins once the data path became per-step (the old loop-invariant
    # batch let XLA hoist patchify out of the scan, masking the conv
    # form's layout copies; k=64 halves the per-dispatch quantize
    # amortization cost).  fwd-only int8 and bf16 B=16 are the reference
    # points, 8 and 32 bracket the batch knee.
    # Case = (batch, k_chain, int8, bwd_dx, patch_gemm, static_act[,
    # int8_attn]).  int8_attn = TPU.INT8_ATTN: the attention QK^T / PV
    # dots also ride the int8 MXU on statically-calibrated q/k/v scales
    # (softmax output scale 1/127 is exact) — the last GEMM class the
    # int8 recipe had not reached (round-5 xprof: 8.9% of step at 45.7
    # TF/s).
    # static_act = TPU.INT8_STATIC_ACT: per-tensor calibrated activation
    # scales (computed once outside the timed window, like the Trainer's
    # per-epoch calibration) replace the per-row dynamic absmax chains
    # the round-4 xprof measured at 13% of the step.
    cases = (
        [
            # headline FIRST (static act, bf16 attention): a valid
            # headline exists even if the deadline cuts the rest.
            # (INT8_ATTN variants are documented measured negatives —
            # BASELINE.md round 5 — and not in the default sweep.)
            (16, 64, True, True, True, True, False),
            (16, 64, True, True, True, False, False),
            (16, 32, False, False, False, False, False),
        ]
        if on_tpu
        else [(8, 2, False, False, False, False, False)]
    )
    # targeted sweeps: PVT_BENCH_CASES="B:K:int8:dx:pg:st[:at],..."
    env_cases = os.environ.get("PVT_BENCH_CASES", "")
    if env_cases:
        cases = [
            tuple(
                [int(f[0]), int(f[1])]
                + [bool(int(v)) for v in f[2:6]]
                + [bool(int(f[6])) if len(f) > 6 else False]
                + [bool(int(f[7])) if len(f) > 7 else False]
            )
            for f in (c.split(":") for c in env_cases.split(",") if c)
        ]
    cases = [tuple(c) + (False,) * (8 - len(c)) for c in cases]
    # each cold compile costs minutes over the axon relay; stop launching
    # new cases past the soft deadline so one JSON line always prints
    deadline = time.perf_counter() + float(
        os.environ.get("PVT_BENCH_DEADLINE_S", "1500")
    )
    for i, (batch, k_chain, int8, bwd_dx, patch_gemm, static_act,
            int8_attn, int8_attn_pv) in enumerate(cases):
        if i > 0 and time.perf_counter() > deadline:
            break
        imodel = model
        if int8 or patch_gemm:
            imodel = _flagship(
                dtype=jnp.bfloat16,
                use_flash=on_tpu,
                remat=False,
                softmax_fp32=False,
                ln_fp32=False,
                int8_train=int8,
                patch_gemm=patch_gemm,
                int8_attn=int8_attn and static_act,
                int8_attn_pv=int8_attn_pv,
            )

        def loss_fn_i8(trainable, frozen, qkqs, x, y):
            qk, qs = qkqs
            p = merge_params(trainable, frozen)
            variables = {"params": p, "qkernel": qk}
            if qs is not None:  # TPU.INT8_STATIC_ACT
                variables["qscale"] = qs
            logits = imodel.apply(variables, x, True)
            return jnp.mean(ce_per_example(logits.astype(jnp.float32), y))

        gfn = jax.value_and_grad(loss_fn_i8) if int8 else grad_fn
        step = make_step(imodel, gfn, k_chain, int8=int8, bwd_dx=bwd_dx)
        qk = None
        if int8:
            # once per run, OUTSIDE the timed window — the Trainer's
            # _frozen_qk semantics (the frozen tower never changes)
            from peft_vit_tpu.ops.int8 import quantize_frozen_tree

            qk = jax.jit(
                lambda f: quantize_frozen_tree(f, bwd_dx=bwd_dx)
            )(frozen)
            qs = None
            if static_act:
                # per-run calibration, also outside the timed window —
                # the Trainer recalibrates once per EPOCH, off the hot
                # path (engine/trainer.py _qk_vars)
                from peft_vit_tpu.ops.int8 import (
                    activation_scales_from_stats,
                )

                rng0 = np.random.RandomState(7)
                xc = jnp.asarray(rng0.randint(
                    0, 256, (batch, 224, 224, 3), dtype=np.uint8
                ))
                mean = jnp.asarray(NORM_MEAN)
                std = jnp.asarray(NORM_STD)

                def _calib(tr, fr, x):
                    p = merge_params(tr, fr)
                    xn = ((x.astype(jnp.float32) - mean) / std).astype(
                        jnp.bfloat16
                    )
                    _, st = imodel.apply(
                        {"params": p}, xn, True, mutable=["qstats"]
                    )
                    return activation_scales_from_stats(
                        st["qstats"], margin=1.5
                    )

                qs = jax.jit(_calib)(trainable, frozen, xc)
            qk = (qk, qs)
        # donated state: each case needs its own copy
        state = init_cell_state(jax.tree.map(jnp.copy, trainable))
        # >= ~4k images per timing window
        n_disp = max(2, 4096 // (batch * k_chain)) if on_tpu else 1
        rate, state = measure(
            step, state, frozen, qk, batch, k_chain, n_disp, warmup=1
        )
        print(
            f"# case B={batch} k={k_chain} int8={int8} dx={bwd_dx} "
            f"static={static_act} attn={int8_attn} pv={int8_attn_pv}: "
            f"{rate:.1f} img/s",
            file=sys.stderr,
            flush=True,
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

"""Multi-chip scaling prediction from single-chip measurements.

The scaling-book recipe applied to this framework's sharding choices:
count the bytes each parallelism strategy puts on the wire per optimizer
step, divide by the interconnect bandwidth, and compare against the
measured single-chip step time.  The reference cannot ask this question
(DDP-only, NCCL does what it does); here the mesh axes are explicit, so
the communication volume is a closed-form function of the config.

All formulas assume ring collectives over ICI (the XLA lowering on a
TPU slice): an all-reduce of S bytes moves 2*S*(n-1)/n per chip, an
all-gather or reduce-scatter moves S*(n-1)/n, and a pipeline ppermute
moves exactly its payload once.

Numbers produced here are PREDICTIONS — labelled as such — anchored to
measured constants (BASELINE.md): they say which strategy's collectives
fit under the compute time, not what a real pod will clock.  Convention
is weak scaling: the per-chip batch (and hence per-chip compute time)
stays fixed as chips are added; `efficiency` answers "does this
strategy's wire traffic hide under the measured step?" assuming XLA
overlaps ring collectives with independent compute.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

# public v5e per-chip figures (Google Cloud TPU v5e docs): 4 ICI links,
# 1,600 Gbps aggregate per chip => 200 GB/s; DCN egress per host is
# orders of magnitude lower — cross-slice DP should batch accordingly.
V5E_ICI_BYTES_PER_S = 200e9
V5E_DCN_BYTES_PER_S = 6.25e9  # 50 Gbps/host, conservative


@dataclass
class StepProfile:
    """What one optimizer step does on one chip (measured or derived)."""

    step_time_s: float  # measured single-chip step wall (per step)
    per_chip_batch: int
    seq_len: int  # tokens after patchify (ViT-B/16@224 -> 197)
    width: int  # hidden size
    layers: int
    trainable_bytes: int  # gradient bytes all-reduced per step (f32)
    grad_dtype_bytes: int = 4


def _ring_allreduce(size: int, n: int) -> float:
    return 2.0 * size * (n - 1) / n


def _ring_gather(size: int, n: int) -> float:
    return 1.0 * size * (n - 1) / n


def predict(
    prof: StepProfile,
    n_chips: int,
    strategy: str = "dp",
    ici_bytes_per_s: float = V5E_ICI_BYTES_PER_S,
    act_dtype_bytes: int = 2,
) -> Dict[str, float]:
    """Per-step comm bytes/time for `strategy` on an n-chip slice.

    strategies:
      dp      — replicated params, gradient all-reduce (the default mesh)
      zero1   — reduce-scatter(grads) + all-gather(updated params): same
                wire bytes as dp's all-reduce, lower peak memory
      tp      — Megatron block sharding: 2 activation all-reduces per
                block per direction (forward g, backward f)
      pp      — GPipe over `pipe` stages: one activation ppermute per
                microbatch per stage boundary, both directions
    """
    n = int(n_chips)
    if n <= 1:
        return {"bytes": 0.0, "comm_s": 0.0, "efficiency": 1.0}
    B, S, H = prof.per_chip_batch, prof.seq_len, prof.width
    act_bytes = B * S * H * act_dtype_bytes
    if strategy == "dp":
        wire = _ring_allreduce(prof.trainable_bytes, n)
    elif strategy == "zero1":
        wire = _ring_gather(prof.trainable_bytes, n) * 2.0
    elif strategy == "tp":
        # 4 all-reduces of the (B, S, H) activation per block per step
        # (2 fwd + 2 bwd), Megatron partitioning of attn + MLP
        wire = 4.0 * prof.layers * _ring_allreduce(act_bytes, n)
    elif strategy == "pp":
        # one boundary send per microbatch per direction per cut;
        # microbatches = n (GPipe default here), cuts = n - 1
        wire = 2.0 * (n - 1) * n * (act_bytes / n)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    comm_s = wire / ici_bytes_per_s
    # efficiency with perfect comm/compute overlap: the slower of the two
    # pipes sets the step time (XLA overlaps ring collectives with
    # independent GEMMs; the un-overlapped bound would be t+c over t)
    eff = prof.step_time_s / max(prof.step_time_s, comm_s)
    return {"bytes": wire, "comm_s": comm_s, "efficiency": eff}


def scaling_table(
    prof: StepProfile,
    chip_counts=(8, 64, 256),
    strategies=("dp", "zero1", "tp", "pp"),
    ici_bytes_per_s: float = V5E_ICI_BYTES_PER_S,
) -> str:
    """Markdown table of predicted per-step comm + scaling efficiency."""
    img_s_chip = prof.per_chip_batch / prof.step_time_s
    lines = [
        f"single-chip: {prof.step_time_s*1e3:.2f} ms/step, "
        f"{img_s_chip:.0f} img/s/chip, grads {prof.trainable_bytes/1e6:.2f} MB",
        "",
        "| strategy | chips | wire MB/step | comm ms | predicted eff | "
        "img/s total |",
        "|---|---|---|---|---|---|",
    ]
    for s in strategies:
        for n in chip_counts:
            r = predict(prof, n, s, ici_bytes_per_s)
            lines.append(
                f"| {s} | {n} | {r['bytes']/1e6:.2f} | "
                f"{r['comm_s']*1e3:.3f} | {r['efficiency']*100:.1f}% | "
                f"{img_s_chip * n * r['efficiency']:.0f} |"
            )
    return "\n".join(lines)


def profile_from_params(
    params,
    mask,
    step_time_s: float,
    per_chip_batch: int,
    seq_len: int = 197,
    width: Optional[int] = None,
    layers: int = 12,
) -> StepProfile:
    """Build a StepProfile from a real param tree + trainable mask."""
    from flax import traverse_util

    from ..peft.masks import count_trainable

    n_train = count_trainable(params, mask)
    if width is None:
        flat = traverse_util.flatten_dict(params, sep="/")
        widths = [
            v.shape[-1]
            for k, v in flat.items()
            if k.endswith("ln_1/scale") or k.endswith("norm1/scale")
        ]
        width = int(widths[0]) if widths else 768
    return StepProfile(
        step_time_s=step_time_s,
        per_chip_batch=per_chip_batch,
        seq_len=seq_len,
        width=int(width),
        layers=layers,
        trainable_bytes=int(n_train) * 4,  # f32 gradients on the wire
    )

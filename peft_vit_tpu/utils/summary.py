"""Model summary + FLOPs accounting.

Replaces the reference's tensorwatch model-stats (lib/utils/utils.py:76-98),
modelsummary.py, and ptflops counting (tools/finetune_lora.py:58,330) with
XLA's own cost analysis — the numbers come from the compiled HLO, so they
are exact for the program that actually runs (fwd or fwd+bwd).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import numpy as np
from flax import traverse_util


def param_summary(params: Dict[str, Any], mask: Optional[Dict] = None) -> str:
    """Per-leaf table + totals (the modelsummary.py analog)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    flat_m = (
        traverse_util.flatten_dict(mask, sep="/") if mask is not None else {}
    )
    lines = []
    total = trainable = 0
    for k in sorted(flat):
        v = flat[k]
        if v is None:
            continue
        n = int(np.prod(v.shape)) if v.shape else 1
        total += n
        t = bool(flat_m.get(k, True))
        trainable += n if t else 0
        lines.append(
            f"{k:<70s} {str(tuple(v.shape)):<20s} {n:>12,d} "
            f"{'train' if t else 'frozen'}"
        )
    lines.append("-" * 110)
    lines.append(
        f"total params: {total / 1e6:.3f}M | trainable: "
        f"{trainable / 1e6:.6f}M ({100 * trainable / max(total, 1):.4f}%)"
    )
    return "\n".join(lines)


def flops_of(fn: Callable, *args) -> float:
    """Exact FLOPs of the compiled program (ptflops analog, but measured
    on the real XLA computation)."""
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", float("nan")))


def bytes_accessed_of(fn: Callable, *args) -> float:
    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("bytes accessed", float("nan")))

"""Per-op TPU profile analysis (SURVEY §5 "Tracing / profiling").

Reference analogs: the tensorwatch/ptflops model stats
(full_shot/main/lib/utils/modelsummary.py) and the CUDA-side profiler
habits the reference leans on.  The TPU-native equivalent is a
``jax.profiler`` trace (an ``xplane.pb`` capture of real device
activity) summarized through xprof's ``op_profile`` tool: per-category
and per-fusion device time with MXU and HBM-bandwidth utilization —
the numbers that actually explain a TPU step's cost.

Two layers:
* :func:`capture_trace` — run a compiled step a few times under
  ``jax.profiler`` and return the ``.xplane.pb`` path.
* :func:`parse_op_profile` / :func:`format_op_profile` — turn the
  capture into structured rows / a terminal table.  Parsing needs the
  ``tensorboard_plugin_profile`` wheel; when it is absent we keep the
  raw trace and say how to view it, rather than failing the run.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Callable, Dict, List, Optional

import jax

__all__ = [
    "capture_trace",
    "find_xplane",
    "parse_op_profile",
    "format_op_profile",
]


def capture_trace(
    step: Callable[[], Any],
    log_dir: str,
    steps: int = 3,
    warmup: int = 1,
) -> Optional[str]:
    """Run ``step()`` under ``jax.profiler`` and return the xplane path.

    ``step`` must itself block on (or return arrays that we can fetch
    from) device completion; we fetch its result to guarantee the traced
    window contains whole executions, not just dispatches.
    """

    def _sync(out):
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "block_until_ready"):
                # host fetch — reliable on every PJRT plugin (bench.py)
                jax.device_get(leaf)
        return out

    for _ in range(warmup):
        _sync(step())
    jax.profiler.start_trace(log_dir)
    try:
        for _ in range(steps):
            out = step()
        _sync(out)
    finally:
        jax.profiler.stop_trace()
    return find_xplane(log_dir)


def find_xplane(log_dir: str) -> Optional[str]:
    """Newest ``*.xplane.pb`` under a profiler log dir, if any."""
    hits = glob.glob(
        os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True
    )
    return max(hits, key=os.path.getmtime) if hits else None


def _row(node: Dict, depth: int, total_time_ps: float) -> Optional[Dict]:
    m = node.get("metrics", {}) or {}
    # current xprof: rawTime (ps) / rawFlops / bandwidthUtils[read,write,..];
    # older tensorboard plugin: fractional time / flops / memoryBandwidth
    t_ps = float(m.get("rawTime", 0.0))
    if t_ps > 0.0:
        time_frac = t_ps / max(total_time_ps, 1.0)
        flops = float(m.get("rawFlops", 0.0))
        tf_s = flops / (t_ps * 1e-12) / 1e12 if flops else 0.0
        bw = max(
            (float(b) for b in m.get("bandwidthUtils", []) or [0.0]),
            default=0.0,
        )
    else:
        time_frac = float(m.get("time", 0.0))
        tf_s = 0.0
        bw = float(m.get("memoryBandwidth", 0.0))
    if time_frac <= 0.0:
        return None
    return {
        "name": node.get("name", "?"),
        "depth": depth,
        "time_frac": time_frac,
        "tf_s": tf_s,
        "mxu_util": float(m.get("flops", 0.0)),
        "hbm_bw_util": bw,
        "occurrences": int(m.get("occurrences", 0))
        or len(node.get("children", []) or []),
    }


def _walk(
    node: Dict,
    depth: int,
    rows: List[Dict],
    max_depth: int,
    total_time_ps: float,
) -> None:
    if depth >= 1:
        row = _row(node, depth, total_time_ps)
        if row is not None:
            rows.append(row)
    if depth < max_depth:
        for ch in node.get("children", []) or []:
            _walk(ch, depth + 1, rows, max_depth, total_time_ps)


def parse_op_profile(xplane_path: str) -> Dict[str, List[Dict]]:
    """Convert an xplane capture into category and op rows.

    Returns ``{"categories": [...], "ops": [...]}`` where each row has
    ``name / time_frac / mxu_util / hbm_bw_util``.  ``time_frac`` is the
    fraction of non-idle device time.  Raises ``RuntimeError`` with a
    human-readable hint when the xprof conversion wheel is missing.
    """
    try:
        # the standalone `xprof` wheel is the maintained home of the
        # conversion tooling; the tensorboard plugin is its predecessor
        from xprof.convert import raw_to_tool_data  # noqa: PLC0415
    except Exception:  # pragma: no cover - env-dependent
        try:
            from tensorboard_plugin_profile.convert import (  # noqa: PLC0415
                raw_to_tool_data,
            )
        except Exception as e:
            raise RuntimeError(
                "xprof / tensorboard_plugin_profile are unavailable "
                f"({type(e).__name__}: {e}); the raw trace at "
                f"{xplane_path} can be opened with xprof/TensorBoard "
                "('pip install xprof')."
            ) from e

    out, _ctype = raw_to_tool_data.xspace_to_tool_data(
        [xplane_path], "op_profile", {"group_by": "category"}
    )
    data = json.loads(out)
    by_cat = (
        data.get("byCategoryExcludeIdle")
        or data.get("byCategory")
        or data.get("byProgramExcludeIdle")
    )
    if by_cat is None:  # pragma: no cover - schema drift guard
        raise RuntimeError(
            f"op_profile returned no byCategory tree: {list(data)}"
        )
    root_m = by_cat.get("metrics", {}) or {}
    total_ps = float(root_m.get("rawTime", 0.0))
    cat_rows: List[Dict] = []
    for ch in by_cat.get("children", []) or []:
        _walk(ch, 1, cat_rows, max_depth=1, total_time_ps=total_ps)
    op_rows: List[Dict] = []
    for ch in by_cat.get("children", []) or []:
        for op in ch.get("children", []) or []:
            _walk(op, 2, op_rows, max_depth=2, total_time_ps=total_ps)
    cat_rows.sort(key=lambda r: -r["time_frac"])
    op_rows.sort(key=lambda r: -r["time_frac"])
    return {"categories": cat_rows, "ops": op_rows}


def format_op_profile(
    profile: Dict[str, List[Dict]], top: int = 15
) -> str:
    """Terminal table: categories first, then the top-K ops/fusions."""
    if not profile["categories"]:
        return (
            "trace contains no device-op metrics (op_profile needs a "
            "TPU/GPU device plane; CPU traces only carry host events)"
        )
    hdr = "                                         time%    TF/s  HBM-bw      n"

    def fmt(r):
        return (
            f"{r['name'][:40]:<40} {100 * r['time_frac']:6.1f}"
            f"  {r['tf_s']:6.1f}  {r['hbm_bw_util']:6.2f}"
            f"  {r['occurrences']:5d}"
        )

    lines = ["category" + hdr[len("category"):]]
    lines.extend(fmt(r) for r in profile["categories"])
    ops = profile["ops"][:top]
    if ops:
        lines.append("")
        lines.append("top ops / fusions" + hdr[len("top ops / fusions"):])
        lines.extend(fmt(r) for r in ops)
    return "\n".join(lines)

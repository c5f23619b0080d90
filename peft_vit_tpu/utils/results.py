"""Results reader: recover accuracies from run logs.

Port of the reference protocol (read_results.py:40-160): glob
``OUTPUT_DIR/{dataset}/{cfg_name}/{prefix}*.txt``, parse the last line's
last token as accuracy and the ``trainable params: X M`` marker, average
over seeds.  Additionally, this framework writes structured JSONL
(``results.jsonl``) next to the text logs — the text path exists for
compatibility, the JSONL path for machines.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def read_log_results(
    log_path: str, dataset_name: str = "", file_prefix: str = ""
) -> Tuple[List[float], List[str]]:
    accs: List[float] = []
    num_para: List[str] = []
    patterns = [
        os.path.join(log_path, dataset_name, file_prefix + "*.txt"),
        os.path.join(log_path, dataset_name, "*", file_prefix + "*.txt"),
    ]
    files = sorted({f for p in patterns for f in glob.glob(p)})
    for file in files:
        try:
            lines = open(file).readlines()
            text = "".join(lines)
            last = lines[-1].strip()
            accs.append(float(last.split(" ")[-1].replace("%", "")))
            num_para.append(
                text.strip().split("trainable params: ")[-1].split("M")[0]
            )
        except Exception:
            continue
    return accs, num_para


def append_jsonl(path: str, record: Dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def summarize(
    output_dir: str,
    datasets: List[str],
    shots: List[int],
    seeds: List[int],
    prefix: str = "finetuning",
) -> Dict[str, Dict[int, float]]:
    """Mean accuracy per (dataset, n-shot) over seeds
    (extract_finetune_results semantics)."""
    out: Dict[str, Dict[int, float]] = {}
    for ds in datasets:
        out[ds] = {}
        for n in shots:
            accs, _ = read_log_results(
                output_dir, ds, f"{prefix}_{n}_"
            )
            out[ds][n] = float(np.mean(accs)) if accs else float("nan")
    return out

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


_NUM = r"([0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?)"
_PROTOCOL_PATTERNS = {
    # "Val split from Train set: Train size is 40.0, and validation size is 10.0."
    "train_size": r"Train size is " + _NUM,
    "val_size": r"validation size is " + _NUM,
    # "Hyperparameters: learning_rate = 0.001, l2_lambda = 0.316"
    "learning_rate": r"Hyperparameters: learning_rate = " + _NUM,
    "l2_lambda": r"l2_lambda = " + _NUM,
    # "Using the full trainval set to train final model. len(dataset)=50"
    "trainval_size": r"full trainval set to train final model\. "
    r"len\(dataset\)=" + _NUM,
    # "trainable params: 0.0789M" (read_results.py marker)
    "trainable_params_m": r"trainable params: " + _NUM + r"\s*M",
}


def parse_protocol(path: str) -> Dict[str, object]:
    """Parse the shared protocol schema out of a run log — works on BOTH
    this framework's logs and the reference's shipped sample logs
    (few_shot/vision_benchmark/test/vitb32_CLIP/log_random_0/...):

    * ``train_size`` / ``val_size`` — the class-balanced split line
    * ``learning_rate`` / ``l2_lambda`` — the final hyperparameter line
      (last occurrence: the sweep logs one per cell, the final run last)
    * ``final_training`` — the "=> The final classifier is on training"
      marker
    * ``trainval_size`` — the merged train+val final-run size
    * ``trainable_params_m`` — the read_results.py parameter marker
    * ``accuracy`` — last line's last token, when it parses (the sample
      logs are truncated mid-run and legitimately have none)
    """
    import re

    text = open(path).read()
    out: Dict[str, object] = {}
    for key, pat in _PROTOCOL_PATTERNS.items():
        hits = re.findall(pat, text)
        if hits:
            out[key] = float(hits[-1])
    out["final_training"] = (
        "=> The final classifier is on training" in text
    )
    lines = [ln for ln in text.strip().splitlines() if ln.strip()]
    if lines:
        try:
            out["accuracy"] = float(
                lines[-1].strip().split(" ")[-1].replace("%", "")
            )
        except ValueError:
            pass
    return out


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

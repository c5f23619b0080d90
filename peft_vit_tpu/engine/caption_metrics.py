"""COCO caption-toolkit metrics, implemented from the published formulas.

The reference's image-caption benchmark defers to the pycocoevalcap
toolkit (few_shot image_caption_evaluator.py); this module provides the
same metric definitions natively so the caption harness runs offline:

* corpus BLEU-1..4 — clipped n-gram precision with brevity penalty
  (Papineni et al. 2002; pycocoevalcap 'closest' reference length)
* ROUGE-L — LCS F-measure with beta=1.2 (Lin 2004), averaged per image
  with the max over references
* CIDEr-D — tf-idf weighted n-gram cosine, n=1..4, length gaussian
  sigma=6, x10 (Vedantam et al. 2015, the -D variant pycocoevalcap uses)
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Sequence, Tuple


def _tokens(s: str) -> List[str]:
    return s.lower().strip().split()


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(
        tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
    )


def bleu(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
    max_n: int = 4,
) -> List[float]:
    """Corpus BLEU-1..max_n in percent."""
    match = [0] * max_n
    total = [0] * max_n
    cand_len = 0
    ref_len = 0
    for cand, refs in zip(candidates, references):
        c = _tokens(cand)
        rs = [_tokens(r) for r in refs]
        cand_len += len(c)
        # closest reference length (ties -> shorter)
        ref_len += min(
            (abs(len(r) - len(c)), len(r)) for r in rs
        )[1]
        for n in range(1, max_n + 1):
            cn = _ngrams(c, n)
            if not cn:
                continue
            max_ref = Counter()
            for r in rs:
                for g, k in _ngrams(r, n).items():
                    max_ref[g] = max(max_ref[g], k)
            match[n - 1] += sum(
                min(k, max_ref[g]) for g, k in cn.items()
            )
            total[n - 1] += sum(cn.values())
    bp = (
        1.0
        if cand_len > ref_len
        else math.exp(1.0 - ref_len / max(cand_len, 1))
    )
    out = []
    logsum = 0.0
    for n in range(max_n):
        p = match[n] / total[n] if total[n] else 0.0
        # tiny smoothing keeps higher-order BLEU defined on short corpora
        logsum += math.log(p) if p > 0 else math.log(1e-12)
        out.append(100.0 * bp * math.exp(logsum / (n + 1)))
    return out


def _lcs(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, start=1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def rouge_l(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
    beta: float = 1.2,
) -> float:
    """Mean ROUGE-L F-measure in percent (max over references)."""
    scores = []
    for cand, refs in zip(candidates, references):
        c = _tokens(cand)
        best = 0.0
        for r in refs:
            rt = _tokens(r)
            lcs = _lcs(c, rt)
            if lcs == 0:
                continue
            prec = lcs / len(c)
            rec = lcs / len(rt)
            best = max(
                best,
                (1 + beta**2)
                * prec
                * rec
                / (rec + beta**2 * prec),
            )
        scores.append(best)
    return 100.0 * sum(scores) / max(len(scores), 1)


def cider_d(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
    max_n: int = 4,
    sigma: float = 6.0,
) -> float:
    """CIDEr-D (x10 scale, as reported by pycocoevalcap)."""
    # document frequency over reference sets
    df: List[Counter] = [Counter() for _ in range(max_n)]
    n_images = len(references)
    for refs in references:
        for n in range(max_n):
            seen = set()
            for r in refs:
                seen |= set(_ngrams(_tokens(r), n + 1))
            for g in seen:
                df[n][g] += 1

    log_n = math.log(max(n_images, 1))

    def vec(tokens: Sequence[str], n: int) -> Tuple[Counter, float]:
        counts = _ngrams(tokens, n + 1)
        v = Counter()
        for g, k in counts.items():
            idf = log_n - math.log(max(df[n][g], 1))
            v[g] = k * idf
        norm = math.sqrt(sum(x * x for x in v.values()))
        return v, norm

    scores = []
    for cand, refs in zip(candidates, references):
        c = _tokens(cand)
        per_n = [0.0] * max_n
        for n in range(max_n):
            cv, cn = vec(c, n)
            for r in refs:
                rt = _tokens(r)
                rv, rn = vec(rt, n)
                if cn == 0 or rn == 0:
                    continue
                # CIDEr-D clips candidate counts to the reference's
                num = sum(min(cv[g], rv[g]) * rv[g] for g in cv)
                sim = num / (cn * rn)
                delta = len(c) - len(rt)
                sim *= math.exp(-(delta**2) / (2 * sigma**2))
                per_n[n] += sim / len(refs)
        scores.append(10.0 * sum(per_n) / max_n)
    return sum(scores) / max(len(scores), 1)


def coco_caption_metrics(
    candidates: Sequence[str], references: Sequence[Sequence[str]]
) -> Dict[str, float]:
    b = bleu(candidates, references)
    return {
        "Bleu_1": b[0],
        "Bleu_2": b[1],
        "Bleu_3": b[2],
        "Bleu_4": b[3],
        "ROUGE_L": rouge_l(candidates, references),
        "CIDEr": cider_d(candidates, references),
    }

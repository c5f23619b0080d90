"""COCO caption-toolkit metrics, implemented from the published formulas.

The reference's image-caption benchmark defers to the pycocoevalcap
toolkit (few_shot image_caption_evaluator.py:11,21-29 selects Bleu /
METEOR / ROUGE_L / CIDEr / SPICE from TEST.METRIC); this module provides
the metric definitions natively so the caption harness runs offline:

* corpus BLEU-1..4 — clipped n-gram precision with brevity penalty
  (Papineni et al. 2002; pycocoevalcap 'closest' reference length)
* ROUGE-L — LCS F-measure with beta=1.2 (Lin 2004), averaged per image
  with the max over references
* CIDEr-D — tf-idf weighted n-gram cosine, n=1..4, length gaussian
  sigma=6, x10 (Vedantam et al. 2015, the -D variant pycocoevalcap uses)
* METEOR — unigram alignment with exact -> Porter-stem -> WordNet-synonym
  stages, harmonic F-mean and chunk fragmentation penalty (Lavie &
  Agarwal 2007; the synonym stage engages only when the local nltk
  wordnet corpus is present, same gating as commands/extract_knowledge)
* SPICE — NOT implemented: it requires the Java Stanford scene-graph
  parser (a dependency even the reference ships out-of-band); recorded
  as an explicit exclusion in PARITY.md
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


def _stemmer():
    try:
        from nltk.stem.porter import PorterStemmer

        return PorterStemmer().stem
    except Exception:
        return lambda w: w


def _wordnet_synsets():
    """Synonym lookup via the LOCAL nltk wordnet corpus; None when the
    corpus data is absent (zero-egress gating, like extract_knowledge)."""
    try:
        from nltk.corpus import wordnet as wn

        wn.synsets("test")  # force the LookupError early
        return lambda w: {
            lemma.name().lower()
            for syn in wn.synsets(w)
            for lemma in syn.lemmas()
        }
    except Exception:
        return None


def _meteor_align(
    cand: List[str], ref: List[str], stem, synsets
) -> List[Tuple[int, int]]:
    """Greedy staged alignment: exact, then stem, then WordNet synonym.
    Each stage matches only still-unaligned tokens; within a stage,
    candidate tokens take the first free reference token (the METEOR
    beam's tie-break for captions is negligible at this length)."""
    used_c = [False] * len(cand)
    used_r = [False] * len(ref)
    pairs: List[Tuple[int, int]] = []

    def stage(match_fn):
        for i, cw in enumerate(cand):
            if used_c[i]:
                continue
            for j, rw in enumerate(ref):
                if used_r[j]:
                    continue
                if match_fn(cw, rw):
                    used_c[i] = used_r[j] = True
                    pairs.append((i, j))
                    break

    stage(lambda a, b: a == b)
    stage(lambda a, b: stem(a) == stem(b))
    if synsets is not None:
        stage(lambda a, b: a in synsets(b) or b in synsets(a))
    return sorted(pairs)


def _meteor_chunks(pairs: List[Tuple[int, int]]) -> int:
    """Number of maximal runs contiguous in BOTH candidate and reference."""
    chunks = 0
    prev = None
    for i, j in pairs:
        if prev is None or i != prev[0] + 1 or j != prev[1] + 1:
            chunks += 1
        prev = (i, j)
    return chunks


def meteor(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
) -> float:
    """Mean METEOR in percent (best reference per image), Lavie & Agarwal
    2007 parameters: F = P*R / (alpha*P + (1-alpha)*R), fragmentation
    penalty gamma * (chunks/matches)^beta."""
    stem = _stemmer()
    synsets = _wordnet_synsets()
    scores = []
    for cand, refs in zip(candidates, references):
        c = _tokens(cand)
        best = 0.0
        for r in refs:
            rt = _tokens(r)
            if not c or not rt:
                continue
            pairs = _meteor_align(c, rt, stem, synsets)
            m = len(pairs)
            if m == 0:
                continue
            p = m / len(c)
            rcl = m / len(rt)
            f_mean = p * rcl / (alpha * p + (1 - alpha) * rcl)
            frag = _meteor_chunks(pairs) / m
            score = f_mean * (1.0 - gamma * frag**beta)
            best = max(best, score)
        scores.append(best)
    return 100.0 * sum(scores) / max(len(scores), 1)


def coco_caption_metrics(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
    metrics: str = "Bleu,METEOR,ROUGE_L,CIDEr",
) -> Dict[str, float]:
    """Metric families selected EXACTLY like the reference's
    image_caption_evaluator (TEST.METRIC.split(',')); a requested SPICE
    logs the documented exclusion instead of failing the run."""
    wanted = [m.strip() for m in str(metrics).split(",") if m.strip()]
    out: Dict[str, float] = {}
    if "Bleu" in wanted:
        b = bleu(candidates, references)
        out.update(
            {f"Bleu_{i + 1}": b[i] for i in range(len(b))}
        )
    if "METEOR" in wanted:
        out["METEOR"] = meteor(candidates, references)
    if "ROUGE_L" in wanted:
        out["ROUGE_L"] = rouge_l(candidates, references)
    if "CIDEr" in wanted:
        out["CIDEr"] = cider_d(candidates, references)
    if "SPICE" in wanted:
        import logging

        logging.getLogger(__name__).warning(
            "SPICE requested but excluded (needs the Java scene-graph "
            "parser; see PARITY.md)"
        )
    return out

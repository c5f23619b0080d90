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
* SPICE — semantic-propositional F1 over scene-graph tuples (Anderson
  et al. 2016).  DOCUMENTED DEVIATION: the reference's evaluator wraps
  the Java Stanford PCFG + dependency scene-graph pipeline
  (image_caption_evaluator.py:11,29-30 via vision_evaluation's
  SPICEScoreEvaluator); this module extracts the graph with a
  rule-based chunker tuned to caption English (closed-class function
  -word lists, light morphological lemmatisation) instead of a learned
  parser, then scores tuples with SPICE's own binary-match F1, with
  the WordNet-synonym tuple matching gated on the local nltk corpus
  exactly like METEOR's synonym stage.  Parse differences move
  individual tuples, so absolute values differ from the Java pipeline;
  the tuple algebra and scoring are SPICE's.  See PARITY.md.
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


# ---------------------------------------------------------------------------
# SPICE (rule-based scene graph; see module docstring for the deviation)
# ---------------------------------------------------------------------------

_DETERMINERS = {
    "a", "an", "the", "this", "that", "these", "those", "some", "any",
    "each", "every", "no", "its", "his", "her", "their", "our", "my",
    "your",
}
_COPULAS = {"is", "are", "was", "were", "be", "being", "been", "am"}
_CONJUNCTIONS = {"and", "or", "while", "as", "but"}
_PREPOSITIONS = {
    "on", "in", "at", "of", "with", "by", "near", "under", "over",
    "above", "below", "behind", "beside", "between", "through",
    "across", "against", "along", "around", "atop", "inside",
    "outside", "onto", "into", "upon", "beneath", "during", "off",
    "to", "from", "next",
}
_NUMBERS = {
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "ten", "several", "many", "few",
}
# Common caption verbs that lack the -ing/-s surface cue.
_BARE_VERBS = {
    "sit", "stand", "ride", "hold", "wear", "walk", "run", "jump",
    "play", "eat", "look", "fly", "lay", "lie", "rest", "hang",
    "stands", "sits", "rides", "holds", "wears", "walks", "runs",
    "jumps", "plays", "eats", "looks", "flies", "lays", "lies",
    "rests", "hangs",
}
_SKIP = {"there", "very", "also", "it", "they", "he", "she", "who", "which"}


def _lemma(word: str) -> str:
    """Light morphological normaliser standing in for the Java
    pipeline's lemmatiser: -ing verbs to base (doubled consonant and
    e-drop handled), 3rd-person/plural -s stripped."""
    w = word
    if w in _ING_NOUNS:
        # noun, not a progressive verb: keep the -ing ("building")
        return w[:-1] if w.endswith("ings") else w
    if len(w) > 5 and w.endswith("ing"):
        stem = w[:-3]
        if len(stem) > 2 and stem[-1] == stem[-2] and stem[-1] not in "aeiou":
            return stem[:-1]  # running -> run
        if stem and stem[-1] not in "aeiou" and w[:-3] + "e" in _SPICE_E_VERBS:
            return stem + "e"  # riding -> ride
        return stem
    if len(w) > 3 and w.endswith("ies"):
        return w[:-3] + "y"  # flies -> fly
    if len(w) > 3 and w.endswith("es"):
        stem = w[:-2]
        if stem.endswith(("ss", "x", "z", "ch", "sh", "o")):
            return stem  # watches -> watch, glasses -> glass
    if len(w) > 3 and w.endswith("s") and not w.endswith("ss"):
        return w[:-1]
    return w


_SPICE_E_VERBS = {"ride", "smile", "slide", "dance", "skate", "bike", "race"}


# -ing words that are nouns in caption English, not progressive verbs
_ING_NOUNS = {
    "building", "buildings", "painting", "paintings", "ceiling",
    "railing", "clothing", "lightning", "evening", "morning",
    "awning", "frosting", "icing", "topping", "seasoning", "dressing",
    "clearing", "crossing", "landing", "opening", "railings",
}


def _is_relation_word(w: str) -> bool:
    if w in _ING_NOUNS:
        return False
    return (
        w in _PREPOSITIONS
        or w in _BARE_VERBS
        or (len(w) > 4 and w.endswith("ing"))
    )


def scene_graph(caption: str) -> set:
    """Rule-based caption scene graph as SPICE tuples: (obj,) objects,
    (obj, attr) attributes, (subj, rel, obj) relations.  Noun phrases
    are chunked between relation words (prepositions / verbs); the
    phrase head is its last content word, preceding content words and
    number words are its attributes."""
    raw = [
        t
        for t in caption.lower().replace(",", " , ").split()
        if t not in _DETERMINERS and t not in _SKIP
    ]
    tuples: set = set()
    # segment into alternating NP / relation runs
    segments: List[Tuple[str, List[str]]] = []  # ("np"|"rel", words)
    for tok in raw:
        if tok == "," or tok in _CONJUNCTIONS:
            segments.append(("brk", []))
            continue
        if tok in _COPULAS:
            # copula starts a relation run only if followed by a
            # relation word ("is sitting on"); bare copula ("dog is
            # brown") attaches what follows to the previous head.
            segments.append(("cop", []))
            continue
        kind = "rel" if _is_relation_word(tok) else "np"
        if segments and segments[-1][0] == kind:
            segments[-1][1].append(tok)
        else:
            segments.append((kind, [tok]))

    heads: List[str] = []  # NP heads in order, for relation linking
    pending_rel: List[str] = []
    after_bare_copula = False
    for kind, words in segments:
        if kind == "brk":
            pending_rel = []
            after_bare_copula = False
            continue
        if kind == "cop":
            after_bare_copula = True
            continue
        if kind == "rel":
            pending_rel = [_lemma(w) for w in words]
            after_bare_copula = False
            continue
        # noun phrase
        lemmas = [_lemma(w) for w in words]
        if after_bare_copula and heads and not pending_rel:
            # "the dog is brown" -> (dog, brown)
            for w in lemmas:
                tuples.add((heads[-1], w))
            after_bare_copula = False
            continue
        head = lemmas[-1]
        tuples.add((head,))
        for w in lemmas[:-1]:
            tuples.add((head, w))
        for w in words[:-1]:
            if w in _NUMBERS:
                tuples.add((head, w))
        if pending_rel and heads:
            tuples.add((heads[-1], " ".join(pending_rel), head))
        pending_rel = []
        heads.append(head)
    # a trailing relation run with no object is still a unary action:
    # "a dog running" -> (dog, run) attribute, as SPICE does
    if segments and segments[-1][0] == "rel" and heads:
        for w in segments[-1][1]:
            tuples.add((heads[-1], _lemma(w)))
    return tuples


def _tuple_match(a: tuple, b: tuple, synsets) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if synsets is not None and (
            x in synsets(y) or y in synsets(x)
        ):
            continue
        return False
    return True


def spice(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
) -> float:
    """Mean SPICE F1 in percent: candidate scene graph vs the UNION of
    the reference graphs (Anderson et al. 2016 §3.2), binary tuple
    matching with WordNet-synonym equivalence when the local corpus is
    present (same gating as METEOR's synonym stage)."""
    synsets = _wordnet_synsets()
    scores = []
    for cand, refs in zip(candidates, references):
        cg = scene_graph(cand)
        rg: set = set()
        for r in refs:
            rg |= scene_graph(r)
        if not cg or not rg:
            scores.append(0.0)
            continue
        matched = sum(
            1
            for t in cg
            if any(_tuple_match(t, u, synsets) for u in rg)
        )
        p = matched / len(cg)
        rec = sum(
            1
            for u in rg
            if any(_tuple_match(u, t, synsets) for t in cg)
        ) / len(rg)
        f1 = 2 * p * rec / (p + rec) if (p + rec) > 0 else 0.0
        scores.append(f1)
    return 100.0 * sum(scores) / max(len(scores), 1)


def coco_caption_metrics(
    candidates: Sequence[str],
    references: Sequence[Sequence[str]],
    metrics: str = "Bleu,METEOR,ROUGE_L,CIDEr",
) -> Dict[str, float]:
    """Metric families selected EXACTLY like the reference's
    image_caption_evaluator (TEST.METRIC.split(','))."""
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
        out["SPICE"] = spice(candidates, references)
    return out

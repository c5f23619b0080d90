"""Offline class-knowledge extraction (reference
commands/extract_knowledge.py:25-1142).

Builds per-dataset class-knowledge dictionaries used by the
knowledge-augmented zero-shot path (engine/zeroshot.knowledge_text):

* WordNet definitions + hypernym path (requires the nltk wordnet corpus
  locally — zero-egress environments must pre-seed it)
* Wiktionary definitions from a local dump (PRE_EXTRACTED dict)
* GPT-3 few-shot prompting (reference calls openai.Completion; here gated
  behind an env key and stubbed offline — the output format matches)

Output: ``{GPT3_DICT_PATH|WIKI_DICT_PATH}/{dataset}_knowledge.json`` with
``{classname: {"def": ..., "path": [...], "gpt3": [...]}}``.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, List, Optional

from ..data.prompts import class_map

logger = logging.getLogger(__name__)


def hypernyms_chain(concept: str) -> List[str]:
    """Full WordNet hypernym chain, first-sense first-hypernym walk
    (reference hypernyms_chain, extract_knowledge.py:263-274)."""
    try:
        from nltk.corpus import wordnet as wn

        ss = wn.synsets(concept.replace(" ", "_"))
    except Exception:
        return []
    chain: List[str] = []
    while ss:
        s = ss[0]
        chain.append(s.lemmas()[0].name())
        ss = s.hypernyms()
    return chain


def wordnet_knowledge(classname: str) -> Dict:
    """Definition + full hypernym chain from the local WordNet corpus
    (extract_ic_konwledge, extract_knowledge.py:276-368)."""
    try:
        from nltk.corpus import wordnet as wn

        synsets = wn.synsets(classname.replace(" ", "_"))
    except Exception as e:  # corpus missing
        logger.debug("wordnet unavailable for %r: %s", classname, e)
        return {}
    if not synsets:
        return {}
    s = synsets[0]
    return {"def": s.definition(), "path": hypernyms_chain(classname)}


def resolve_meaning(
    classname: str, wik_dict: Dict
) -> Optional[str]:
    """Resolve a class name to a Wiktionary definition from a local dump
    (the reference delegates to an unshipped ``get_description.
    resolve_meaning`` over ``wik_dict.json``; this is our resolver).

    Tries, in order: exact, lowercase, underscored, de-pluralized, and
    finally the head noun of a multi-word name.  Dump entries may be a
    plain string, a list of senses, or a dict with 'meanings'/'senses'/
    'definitions' lists."""

    def first_sense(entry) -> Optional[str]:
        if entry is None:
            return None
        if isinstance(entry, str):
            return entry or None
        if isinstance(entry, list):
            return first_sense(entry[0]) if entry else None
        if isinstance(entry, dict):
            for key in ("meanings", "senses", "definitions", "def"):
                if key in entry:
                    return first_sense(entry[key])
            for v in entry.values():  # e.g. {"noun": [...]}
                got = first_sense(v)
                if got:
                    return got
        return None

    name = classname.strip()
    candidates = [name, name.lower(), name.lower().replace(" ", "_")]
    low = name.lower()
    if low.endswith("es"):
        candidates.append(low[:-2])
    if low.endswith("s"):
        candidates.append(low[:-1])
    if " " in low:
        candidates.append(low.split()[-1])  # head noun
    for cand in candidates:
        if cand in wik_dict:
            got = first_sense(wik_dict[cand])
            if got:
                return got
    return None


def wiktionary_knowledge(
    classname: str, wiki_dict: Optional[Dict] = None
) -> Dict:
    """Wiktionary-dump lookup (extract_wiki_konwledge,
    extract_knowledge.py:369-473)."""
    if not wiki_dict:
        return {}
    meaning = resolve_meaning(classname, wiki_dict)
    return {"wiki": meaning} if meaning else {}


def build_gpt3_prompt(
    classname: str,
    examples: List[tuple],
    n_shot: int = 3,
    seed: int = 0,
) -> str:
    """The reference's few-shot prompt (ask_gpt3, extract_knowledge.py:
    120-138): wiki-known (name, definition) pairs as in-context examples."""
    import random as _random

    rng = _random.Random(seed)
    prompt = "Please explain the concept according to the context.\n===\n"
    n = min(n_shot, len(examples))
    for _ in range(n):
        name, definition = examples[rng.randint(0, len(examples) - 1)]
        prompt += "Q: %s\nA: %s\n\n===\n" % (name, definition)
    prompt += "Q: %s\nA:" % classname
    return prompt


def gpt3_knowledge(
    classname: str,
    examples: Optional[List[tuple]] = None,
    n_shot: int = 3,
    n_ensemble: int = 1,
    max_tokens: int = 50,
) -> Dict:
    """Few-shot GPT-3 queries with wiki-grounded in-context examples
    (ask_gpt3, extract_knowledge.py:120-178: temperature 0, stop at
    newline, n_ensemble repeats).  Requires OPENAI_API_KEY; {} offline."""
    if not os.environ.get("OPENAI_API_KEY"):
        return {}
    try:  # pragma: no cover - network path
        import openai

        answers = []
        for rep in range(n_ensemble):
            prompt = build_gpt3_prompt(
                classname, examples or [], n_shot, seed=rep
            )
            resp = openai.Completion.create(
                engine=os.environ.get("PVT_GPT3_ENGINE", "davinci"),
                prompt=prompt,
                max_tokens=max_tokens,
                temperature=0.0,
                stop=["\n", "<|endoftext|>"],
            )
            answers.append(resp.choices[0].text.strip())
        return {"gpt3": answers}
    except Exception as e:
        logger.warning("gpt3 query failed: %s", e)
        return {}


def extract_dataset_knowledge(
    dataset: str,
    classnames: Optional[List[str]] = None,
    out_dir: str = "resources/knowledge",
    use_wordnet: bool = True,
    use_wiki: bool = False,
    use_gpt3: bool = False,
    wiki_dict_path: Optional[str] = None,
) -> str:
    classnames = classnames or class_map(dataset) or []
    if not classnames:
        raise ValueError(f"no class names known for {dataset!r}")
    wiki_dict = None
    if use_wiki and wiki_dict_path and os.path.exists(wiki_dict_path):
        with open(wiki_dict_path) as f:
            wiki_dict = json.load(f)
    out: Dict[str, Dict] = {}
    for name in classnames:
        entry: Dict = {}
        if use_wordnet:
            entry.update(wordnet_knowledge(name))
        if use_wiki:
            entry.update(wiktionary_knowledge(name, wiki_dict))
        out[name] = entry
    if use_gpt3:
        # wiki-grounded in-context examples (the reference draws them
        # from the classes whose wiki lookup succeeded, :137-178)
        examples = [
            (n, e["wiki"]) for n, e in out.items() if e.get("wiki")
        ]
        for name in classnames:
            out[name].update(gpt3_knowledge(name, examples))
    coverage = sum(1 for e in out.values() if e.get("wiki"))
    if use_wiki:
        logger.info(
            "The wiki knowledge coverage is %d/%d", coverage, len(out)
        )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{dataset}_knowledge.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    logger.info("=> wrote %s (%d classes)", path, len(out))
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description="extract class knowledge")
    p.add_argument("--dataset", required=True)
    p.add_argument("--out", default="resources/knowledge")
    p.add_argument("--wordnet", action="store_true", default=True)
    p.add_argument("--wiki", action="store_true")
    p.add_argument("--gpt3", action="store_true")
    p.add_argument("--wiki-dict", default=None)
    args = p.parse_args(argv)
    return extract_dataset_knowledge(
        args.dataset,
        out_dir=args.out,
        use_wordnet=args.wordnet,
        use_wiki=args.wiki,
        use_gpt3=args.gpt3,
        wiki_dict_path=args.wiki_dict,
    )


if __name__ == "__main__":
    main()

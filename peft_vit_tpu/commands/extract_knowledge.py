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
import functools
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


@functools.lru_cache(maxsize=1)
def gpt3_corpus() -> Dict:
    """The reference tool's constant data, ported verbatim as a resource
    (resources/knowledge/gpt3_corpus.json): the 22-dataset batch list
    (extract_knowledge.py:42), the ODinW class list (:692), the ODinW
    benchmark dataset list (:1128), and the exact prompt format /
    decoding parameters of ask_gpt3 (:120-149).  Cached: callers build
    one prompt per classname and must not re-parse the JSON each time."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "resources",
        "knowledge",
        "gpt3_corpus.json",
    )
    with open(path) as f:
        return json.load(f)


def build_gpt3_prompt(
    classname: str,
    examples: List[tuple],
    n_shot: Optional[int] = None,
    seed: int = 0,
) -> str:
    """The reference's few-shot prompt (ask_gpt3, extract_knowledge.py:
    120-138): wiki-known (name, definition) pairs as in-context examples,
    format/shots taken from the ported corpus so the emitted prompt is
    reference-identical."""
    import random as _random

    spec = gpt3_corpus()["prompt"]
    if n_shot is None:
        n_shot = int(spec["n_shot"])
    rng = _random.Random(seed)
    prompt = spec["header"]
    n = min(n_shot, len(examples))
    for _ in range(n):
        name, definition = examples[rng.randint(0, len(examples) - 1)]
        prompt += spec["example_format"] % (name, definition)
    prompt += spec["query_format"] % classname
    return prompt


def gpt3_knowledge(
    classname: str,
    examples: Optional[List[tuple]] = None,
    n_shot: Optional[int] = None,
    n_ensemble: Optional[int] = None,
    max_tokens: Optional[int] = None,
) -> Dict:
    """Few-shot GPT-3 queries with wiki-grounded in-context examples
    (ask_gpt3, extract_knowledge.py:120-178: temperature 0, stop at
    newline, n_ensemble repeats).  All decoding parameters default to the
    ported corpus values.  Requires OPENAI_API_KEY; {} offline."""
    if not os.environ.get("OPENAI_API_KEY"):
        return {}
    spec = gpt3_corpus()["prompt"]
    n_ensemble = n_ensemble or int(spec["n_ensemble"])
    max_tokens = max_tokens or int(spec["max_tokens"])
    try:  # pragma: no cover - network path
        import openai

        answers = []
        for rep in range(n_ensemble):
            prompt = build_gpt3_prompt(
                classname, examples or [], n_shot, seed=rep
            )
            resp = openai.Completion.create(
                engine=os.environ.get(
                    "PVT_GPT3_ENGINE", spec["engine"]
                ),
                prompt=prompt,
                max_tokens=max_tokens,
                temperature=float(spec["temperature"]),
                stop=list(spec["stop"]),
            )
            answers.append(resp.choices[0].text.strip())
        return {"gpt3": answers}
    except Exception as e:
        logger.warning("gpt3 query failed: %s", e)
        return {}


def dump_gpt3_prompts(
    dataset: str,
    classnames: Optional[List[str]] = None,
    out_dir: str = "resources/knowledge",
    wiki_dict_path: Optional[str] = None,
) -> str:
    """Emit the exact GPT-3 prompts the reference would send (one per
    class, reference prompt format) WITHOUT querying — auditable offline,
    and byte-identical to what runs when a key is present."""
    classnames = classnames or class_map(dataset) or []
    if not classnames:
        raise ValueError(f"no class names known for {dataset!r}")
    wiki_dict = None
    if wiki_dict_path and os.path.exists(wiki_dict_path):
        with open(wiki_dict_path) as f:
            wiki_dict = json.load(f)
    examples = []
    for name in classnames:
        got = wiktionary_knowledge(name, wiki_dict)
        if got.get("wiki"):
            examples.append((name, got["wiki"]))
    prompts = {
        name: build_gpt3_prompt(name, examples, seed=0)
        for name in classnames
    }
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"GPT3_prompts_{dataset}.json")
    with open(path, "w") as f:
        json.dump(prompts, f, indent=1)
    logger.info("=> wrote %s (%d prompts)", path, len(prompts))
    return path


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
    p.add_argument("--dataset", default=None)
    p.add_argument(
        "--all",
        action="store_true",
        help="iterate the reference's 22-dataset batch list "
        "(extract_knowledge.py:42, ported in gpt3_corpus.json)",
    )
    p.add_argument(
        "--odinw-list",
        action="store_true",
        help="use the ported ODinW class-name list "
        "(extract_konwledge_for_odinw_from_list, :692)",
    )
    p.add_argument("--out", default="resources/knowledge")
    p.add_argument("--wordnet", action="store_true", default=True)
    p.add_argument("--wiki", action="store_true")
    p.add_argument("--gpt3", action="store_true")
    p.add_argument(
        "--dump-prompts",
        action="store_true",
        help="write the reference-identical GPT-3 prompts without querying",
    )
    p.add_argument("--wiki-dict", default=None)
    args = p.parse_args(argv)
    corpus = gpt3_corpus()
    if args.all:
        datasets = list(corpus["ds_list"])
    elif args.dataset:
        datasets = [args.dataset]
    elif args.odinw_list:
        datasets = ["odinw_meta_classname_list"]
    else:
        p.error("one of --dataset / --all / --odinw-list is required")
    outputs = []
    for ds in datasets:
        names = (
            list(corpus["odinw_classnames"]) if args.odinw_list else None
        )
        try:
            if args.dump_prompts:
                outputs.append(
                    dump_gpt3_prompts(
                        ds, names, out_dir=args.out,
                        wiki_dict_path=args.wiki_dict,
                    )
                )
            else:
                outputs.append(
                    extract_dataset_knowledge(
                        ds,
                        classnames=names,
                        out_dir=args.out,
                        use_wordnet=args.wordnet,
                        use_wiki=args.wiki,
                        use_gpt3=args.gpt3,
                        wiki_dict_path=args.wiki_dict,
                    )
                )
        except ValueError as e:
            # batch mode tolerates datasets with no local class list
            if not (args.all and len(datasets) > 1):
                raise
            logger.warning("skipping %s: %s", ds, e)
    return outputs if (args.all or len(outputs) != 1) else outputs[0]


if __name__ == "__main__":
    main()

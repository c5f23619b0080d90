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


def wordnet_knowledge(classname: str) -> Dict:
    """Definition + hypernym path from the local WordNet corpus."""
    try:
        from nltk.corpus import wordnet as wn

        synsets = wn.synsets(classname.replace(" ", "_"))
    except Exception as e:  # corpus missing
        logger.debug("wordnet unavailable for %r: %s", classname, e)
        return {}
    if not synsets:
        return {}
    s = synsets[0]
    path = [p.lemma_names()[0] for p in s.hypernym_paths()[0][-4:]]
    return {"def": s.definition(), "path": path}


def wiktionary_knowledge(
    classname: str, wiki_dict: Optional[Dict] = None
) -> Dict:
    """Pre-extracted Wiktionary dict lookup (the reference's live wiki DB
    path needs a local dump; PRE_EXTRACTED mode)."""
    if wiki_dict and classname in wiki_dict:
        return {"def": wiki_dict[classname]}
    return {}


def gpt3_knowledge(classname: str, n_items: int = 1) -> Dict:
    """Few-shot GPT-3 queries (ask_gpt3, extract_knowledge.py:25-80).
    Requires OPENAI_API_KEY; returns {} offline."""
    if not os.environ.get("OPENAI_API_KEY"):
        return {}
    try:  # pragma: no cover - network path
        import openai

        prompt = (
            f"Q: What is a {classname}?\nA:"
        )
        resp = openai.Completion.create(
            engine="text-davinci-002",
            prompt=prompt,
            max_tokens=50,
            n=n_items,
        )
        return {"gpt3": [c.text.strip() for c in resp.choices]}
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
        if use_gpt3:
            entry.update(gpt3_knowledge(name))
        out[name] = entry
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

"""Knowledge extraction: Wiktionary-dump resolution, GPT-3 prompt
construction, and the knowledge-augmented zero-shot text path."""

import json
import os

import pytest

from peft_vit_tpu.commands.extract_knowledge import (
    build_gpt3_prompt,
    extract_dataset_knowledge,
    resolve_meaning,
    wiktionary_knowledge,
)

WIK = {
    "dog": "a domesticated carnivorous mammal",
    "sports car": {"meanings": ["a low small fast car"]},
    "rose": [{"senses": ["a prickly flowering shrub"]}],
    "car": {"noun": ["a wheeled motor vehicle"]},
}


class TestResolveMeaning:
    def test_exact_and_case(self):
        assert resolve_meaning("dog", WIK) == (
            "a domesticated carnivorous mammal"
        )
        assert resolve_meaning("Dog", WIK) == (
            "a domesticated carnivorous mammal"
        )

    def test_nested_entry_shapes(self):
        assert resolve_meaning("sports car", WIK) == "a low small fast car"
        assert resolve_meaning("rose", WIK) == "a prickly flowering shrub"

    def test_plural_and_head_noun(self):
        assert resolve_meaning("dogs", WIK) == (
            "a domesticated carnivorous mammal"
        )
        # multi-word falls back to the head noun
        assert resolve_meaning("red racing car", WIK) == (
            "a wheeled motor vehicle"
        )

    def test_missing(self):
        assert resolve_meaning("quasar", WIK) is None
        assert wiktionary_knowledge("quasar", WIK) == {}


class TestGpt3Prompt:
    def test_reference_format(self):
        examples = [("dog", "a mammal"), ("car", "a vehicle")]
        p = build_gpt3_prompt("zebra", examples, n_shot=2, seed=0)
        assert p.startswith(
            "Please explain the concept according to the context.\n===\n"
        )
        assert p.endswith("Q: zebra\nA:")
        assert p.count("\n===\n") == 3  # header + 2 examples

    def test_no_examples(self):
        p = build_gpt3_prompt("zebra", [], n_shot=3)
        assert p.endswith("Q: zebra\nA:")


class TestExtractPipeline:
    def test_wiki_extraction_and_zeroshot_consumption(self, tmp_path):
        wik_path = tmp_path / "wik_dict.json"
        wik_path.write_text(json.dumps(WIK))
        from peft_vit_tpu.data.prompts import register_prompts

        register_prompts("toy-knowledge", ["dog", "sports car", "quasar"])
        out = extract_dataset_knowledge(
            "toy-knowledge",
            out_dir=str(tmp_path / "knowledge"),
            use_wordnet=False,
            use_wiki=True,
            wiki_dict_path=str(wik_path),
        )
        d = json.loads(open(out).read())
        assert d["dog"]["wiki"].startswith("a domesticated")
        assert d["quasar"] == {}

        # the zero-shot text path appends the definition
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.engine.zeroshot import knowledge_text

        cfg = get_default_config()
        cfg.KNOWLEDGE.WIKITIONARY.USE_DEFINITION = True
        cfg.KNOWLEDGE.WIKITIONARY.WIKI_DICT_PATH = str(
            tmp_path / "knowledge"
        )
        suffix = knowledge_text(cfg, "toy-knowledge", "dog")
        assert "domesticated" in suffix
        assert knowledge_text(cfg, "toy-knowledge", "quasar") == ""

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


class TestGpt3Corpus:
    """The ported constant data of the reference GPT-3 tool
    (extract_knowledge.py:42,:692,:1128 + the ask_gpt3 prompt format)."""

    def test_corpus_contents(self):
        from peft_vit_tpu.commands.extract_knowledge import gpt3_corpus

        c = gpt3_corpus()
        assert len(c["ds_list"]) == 22
        assert c["ds_list"][0] == "eurosat-clip"
        assert "stanfordcar" in c["ds_list"]
        assert len(c["odinw_classnames"]) == 46
        assert c["odinw_classnames"][0] == "Ambulance"
        assert len(c["odinw_datasets"]) == 27
        spec = c["prompt"]
        assert spec["engine"] == "davinci-msft"
        assert spec["stop"] == ["\n", "<|endoftext|>"]
        assert spec["n_shot"] == 5

    def test_default_shots_from_corpus(self):
        from peft_vit_tpu.commands.extract_knowledge import (
            build_gpt3_prompt,
        )

        examples = [(f"c{i}", f"def {i}") for i in range(10)]
        p = build_gpt3_prompt("zebra", examples, seed=0)
        assert p.count("\n===\n") == 6  # header + n_shot=5 examples

    def test_dump_prompts_offline(self, tmp_path):
        from peft_vit_tpu.commands.extract_knowledge import (
            dump_gpt3_prompts,
        )
        from peft_vit_tpu.data.prompts import register_prompts

        wik_path = tmp_path / "wik.json"
        wik_path.write_text(json.dumps(WIK))
        register_prompts("toy-gpt3", ["dog", "sports car", "zebra"])
        out = dump_gpt3_prompts(
            "toy-gpt3",
            out_dir=str(tmp_path),
            wiki_dict_path=str(wik_path),
        )
        prompts = json.loads(open(out).read())
        assert set(prompts) == {"dog", "sports car", "zebra"}
        p = prompts["zebra"]
        assert p.startswith(
            "Please explain the concept according to the context.\n===\n"
        )
        assert p.endswith("Q: zebra\nA:")
        # wiki-grounded in-context examples present (sampled with
        # replacement, exactly like the reference's random.randint draw)
        assert "a domesticated" in p or "a low small fast car" in p

    def test_cli_batch_and_odinw(self, tmp_path):
        from peft_vit_tpu.commands.extract_knowledge import main

        outs = main([
            "--all", "--dump-prompts", "--out", str(tmp_path / "b"),
        ])
        # batch mode: datasets without local class lists are skipped,
        # the ones with ported prompt lists emit files
        assert isinstance(outs, list) and len(outs) > 0
        odinw = main([
            "--odinw-list", "--dump-prompts", "--out", str(tmp_path / "o"),
        ])
        prompts = json.loads(open(odinw).read())
        assert len(prompts) == 46 and "Ambulance" in prompts


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

"""Tokenizer / prompt / zero-shot-path tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.data.prompts import class_map, template_map
from peft_vit_tpu.data.tokenizer import get_tokenizer, tokenize
from peft_vit_tpu.engine.zeroshot import (
    clip_zeroshot_evaluator,
    extract_image_features,
    extract_text_features,
)


class TestTokenizer:
    def test_known_golden_ids(self):
        """Public CLIP token ids: sot=49406, eot=49407,
        'a photo of a cat' -> [320, 1125, 539, 320, 2368]."""
        toks = tokenize("a photo of a cat", 16)
        expect = [49406, 320, 1125, 539, 320, 2368, 49407]
        np.testing.assert_array_equal(toks[0, : len(expect)], expect)
        assert (toks[0, len(expect) :] == 0).all()

    def test_roundtrip(self):
        # CLIP decode is lossy around digit/punctuation boundaries (every
        # token ends a word), so compare space-insensitively.
        tok = get_tokenizer()
        for s in ("hello world", "a diagram of 42 things!", "FGVC aircraft"):
            ids = tok.encode(s)
            assert tok.decode(ids).replace(" ", "") == s.lower().replace(
                " ", ""
            )

    def test_truncation_keeps_eot(self):
        tok = get_tokenizer()
        long = "word " * 100
        out = tok.tokenize(long, 16)
        assert out.shape == (1, 16)
        assert out[0, -1] == tok.eot

    def test_vocab_size(self):
        assert get_tokenizer().vocab_size == 49408


class TestPrompts:
    def test_builtin_classes(self):
        assert class_map("cifar-10")[0] == "airplane"
        assert len(class_map("cifar-10")) == 10

    def test_generic_fallback(self):
        t = template_map("some-unknown-dataset")
        assert "a photo of a {}." in t

    def test_all_registry_datasets_resolve(self):
        # every real dataset in the registry has built-in class names and
        # templates (ported from the reference's 3.3k-line prompts module);
        # the class count must match the registry
        from peft_vit_tpu.data.registry import _INFO

        for name, info in _INFO.items():
            if name.startswith("synthetic"):
                continue  # procedural: class names are config-dependent
            classes = class_map(name)
            assert classes, f"no class list for {name}"
            assert len(classes) == info.num_classes, name
            templates = template_map(name)
            assert templates and all("{}" in t for t in templates), name

    def test_imagenet_prompt_set_complete(self):
        assert len(class_map("imagenet-1k")) == 1000
        assert len(template_map("imagenet-1k")) == 80
        assert class_map("caltech-101")[0] == "accordion"

    def test_register_overrides_builtin(self):
        from peft_vit_tpu.data.prompts import (
            _builtin_cache,
            register_prompts,
        )

        try:
            register_prompts("cifar-10", ["a", "b"], ["pic of {}"])
            assert class_map("cifar-10") == ["a", "b"]
            assert template_map("cifar-10") == ["pic of {}"]
        finally:
            _builtin_cache.pop("cifar-10", None)

    def test_external_json(self, tmp_path):
        import json

        d = tmp_path / "mydata"
        d.mkdir()
        (d / "prompts.json").write_text(
            json.dumps(
                {"classes": ["x", "y"], "templates": ["photo: {}"]}
            )
        )
        assert class_map("mydata", str(tmp_path)) == ["x", "y"]
        assert template_map("mydata", str(tmp_path)) == ["photo: {}"]


class TestZeroShot:
    def test_evaluator_perfect_features(self):
        """Orthogonal class features -> 100% accuracy."""
        text = np.eye(4, dtype=np.float32)
        img = text[np.array([0, 1, 2, 3, 0, 1])]
        y = np.array([0, 1, 2, 3, 0, 1])
        acc, logits = clip_zeroshot_evaluator(img, text, y)
        assert acc == 100.0
        assert logits.shape == (6, 4)

    def test_extract_text_features_shape_and_norm(self):
        cfg = get_default_config()
        cfg.DATASET.DATASET = "cifar-10"

        def fake_encode(toks):
            # deterministic fake embedding from the token ids
            return jnp.asarray(
                np.asarray(toks, np.float32)[:, :8] + 1.0
            )

        feats = extract_text_features(fake_encode, cfg)
        assert feats.shape == (10, 8)
        np.testing.assert_allclose(
            jnp.linalg.norm(feats, axis=-1), 1.0, atol=1e-5
        )

    def test_extract_image_features_cache(self, tmp_path):
        calls = []

        def enc(x):
            calls.append(1)
            return jnp.ones((x.shape[0], 4))

        x = np.zeros((10, 8, 8, 3), np.float32)
        p = str(tmp_path / "cache.npz")
        f1 = extract_image_features(enc, x, batch_size=4, cache_path=p)
        n_calls = len(calls)
        f2 = extract_image_features(enc, x, batch_size=4, cache_path=p)
        assert len(calls) == n_calls  # cache hit, no re-encode
        np.testing.assert_allclose(f1, f2)

"""Auxiliary subsystem tests: retrieval, ReaL labels, submission, custom
datasets, ResNet-in-trainer, eval orchestrator glue."""

import json
import os

import numpy as np
import pytest

from peft_vit_tpu.engine.retrieval import (
    FakedImageCaptionModel,
    image_caption_eval,
    real_labels_accuracy,
    retrieval_metrics,
    valid_labels_accuracy,
)
from peft_vit_tpu.utils.submission import (
    PredictionSubmission,
    submit_predictions,
)
from peft_vit_tpu.data.custom import (
    CHESTX_CLASSES,
    VOC_CLASSES,
    chestxray8,
    voc2007_classification,
)


class TestRetrieval:
    def test_perfect_pairs(self):
        f = np.eye(8, dtype=np.float32)
        m = retrieval_metrics(f, f)
        assert m["i2t_R@1"] == 100.0 and m["t2i_R@1"] == 100.0
        assert m["i2t_median_rank"] == 1.0

    def test_shuffled_worse(self):
        rng = np.random.RandomState(0)
        img = rng.randn(16, 8).astype(np.float32)
        txt = img + rng.randn(16, 8).astype(np.float32) * 0.01
        m_good = retrieval_metrics(img, txt)
        m_bad = retrieval_metrics(img, txt[::-1])
        assert m_good["i2t_R@1"] > m_bad["i2t_R@1"]


class TestRealLabels:
    def test_multi_acceptable(self):
        scores = np.asarray([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]])
        real = [[0, 1], [0], []]  # third image: no labels -> skipped
        acc = real_labels_accuracy(scores, real)
        assert acc == 50.0  # 1st hits, 2nd misses, 3rd skipped

    def test_valid_labels_subset(self):
        scores = np.asarray(
            [[5.0, 1.0, 9.0], [1.0, 2.0, 0.0]], np.float32
        )
        # restrict to classes {0, 1}: argmax of col subset
        acc = valid_labels_accuracy(scores, np.asarray([0, 1]), [0, 1])
        assert acc == 100.0


class TestCaption:
    def test_fake_model_plumbing(self):
        model = FakedImageCaptionModel("a photo of food")
        m = image_caption_eval(
            model,
            [None, None],
            [["a photo of food"], ["something else entirely"]],
        )
        assert 0.0 < m["bleu1"] <= 100.0
        for key in ("Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"):
            assert key in m

    def test_coco_metrics_perfect_match(self):
        from peft_vit_tpu.engine.caption_metrics import (
            bleu,
            cider_d,
            coco_caption_metrics,
            rouge_l,
        )

        cands = [
            "a dog runs in the park",
            "two cats sleep on a mat",
            "a red car on the street",
        ]
        refs = [[c] for c in cands]
        b = bleu(cands, refs)
        assert all(abs(x - 100.0) < 1e-9 for x in b)
        assert rouge_l(cands, refs) == pytest.approx(100.0)
        # identical candidate = cosine 1 per n, scaled x10
        assert cider_d(cands, refs) == pytest.approx(10.0, abs=1e-6)
        m = coco_caption_metrics(cands, refs)
        assert m["Bleu_4"] == pytest.approx(100.0)

    def test_coco_metrics_partial_match(self):
        from peft_vit_tpu.engine.caption_metrics import bleu, rouge_l

        # candidate shares 3 of 4 unigrams with the reference
        cands = ["the cat sat down"]
        refs = [["the cat sat up"]]
        b = bleu(cands, refs)
        assert b[0] == pytest.approx(75.0)
        assert b[3] < b[0]
        r = rouge_l(cands, refs)
        assert 0.0 < r < 100.0

    def test_meteor_exact_and_ordering(self):
        from peft_vit_tpu.engine.caption_metrics import meteor

        # identical sentence: P=R=1, F=1, one chunk over 6 matches ->
        # score = 1 - 0.5 * (1/6)^3
        m = meteor(["the cat sat on the mat"], [["the cat sat on the mat"]])
        assert m == pytest.approx(100.0 * (1 - 0.5 / 216), abs=1e-6)
        # same unigrams scrambled: same P/R but fragmented -> lower
        scrambled = meteor(
            ["mat the on sat cat the"], [["the cat sat on the mat"]]
        )
        assert 0.0 < scrambled < m
        # no overlap -> 0
        assert meteor(["x y z"], [["a b c"]]) == 0.0

    def test_meteor_stem_matching(self):
        from peft_vit_tpu.engine.caption_metrics import meteor

        # 'cats'~'cat' and 'running'~'runs' only match via Porter stems
        with_stem = meteor(["cats running"], [["cat runs"]])
        assert with_stem > 0.0

    def test_meteor_hand_computed_fixture(self):
        """Hand-computed pin of OUR METEOR parameters (PARITY.md
        documented deviation: this is Lavie–Agarwal 2007, NOT the
        reference's pycocoevalcap METEOR-1.5 jar with paraphrase tables).

        cand 'the cat sat' vs ref 'the cat ran fast':
        m=2 (the, cat), P=2/3, R=2/4;
        F = P*R / (0.9 P + 0.1 R) = (1/3) / (0.6 + 0.05) = 0.5128205...;
        one contiguous chunk -> penalty = 0.5 * (1/2)^3 = 0.0625;
        score = F * 0.9375 = 0.48076923... -> 48.076923 in percent."""
        from peft_vit_tpu.engine.caption_metrics import meteor

        got = meteor(["the cat sat"], [["the cat ran fast"]])
        p, r = 2 / 3, 2 / 4
        f = p * r / (0.9 * p + 0.1 * r)
        want = 100.0 * f * (1.0 - 0.5 * (1 / 2) ** 3)
        assert got == pytest.approx(want, abs=1e-9)
        assert got == pytest.approx(48.07692307692308, abs=1e-6)

    def test_metric_selection_matches_reference(self):
        """TEST.METRIC comma-selection semantics
        (image_caption_evaluator.py:21-29)."""
        from peft_vit_tpu.engine.caption_metrics import coco_caption_metrics

        cands = ["a dog"]
        refs = [["a dog"]]
        only_bleu = coco_caption_metrics(cands, refs, metrics="Bleu")
        assert set(only_bleu) == {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4"}
        m = coco_caption_metrics(cands, refs, metrics="METEOR,CIDEr")
        assert set(m) == {"METEOR", "CIDEr"}
        s = coco_caption_metrics(cands, refs, metrics="SPICE")
        assert set(s) == {"SPICE"}

    def test_spice_scene_graph_hand_computed(self):
        """Rule-based scene graph extraction (documented deviation from
        the Java pipeline, image_caption_evaluator.py:11,29-30)."""
        from peft_vit_tpu.engine.caption_metrics import scene_graph

        assert scene_graph("a brown dog runs on the green grass") == {
            ("dog",),
            ("dog", "brown"),
            ("dog", "run on", "grass"),
            ("grass",),
            ("grass", "green"),
        }
        # copula + adjective attaches as an attribute
        assert scene_graph("the dog is brown") == {
            ("dog",),
            ("dog", "brown"),
        }
        # number words are attributes; -ing verbs lemmatise to base
        assert scene_graph("two men riding horses on a beach") == {
            ("men",),
            ("men", "two"),
            ("men", "ride", "horse"),
            ("horse",),
            ("horse", "on", "beach"),
            ("beach",),
        }
        # trailing verb with no object becomes a unary action attribute
        assert scene_graph("a dog running") == {("dog",), ("dog", "run")}
        # -ing NOUNS ("building", "painting") are not relation words
        assert scene_graph("a tall building in the city") == {
            ("building",),
            ("building", "tall"),
            ("building", "in", "city"),
            ("city",),
        }

    def test_spice_f1_hand_computed(self):
        """SPICE tuple F1 vs the UNION of reference graphs (Anderson
        et al. 2016 sec 3.2)."""
        from peft_vit_tpu.engine.caption_metrics import spice

        # identical graphs -> 100
        assert spice(["a brown dog"], [["a brown dog"]]) == pytest.approx(
            100.0
        )
        # disjoint graphs -> 0
        assert spice(["blue car"], [["red bicycle"]]) == pytest.approx(0.0)
        # cand graph {(dog,), (dog,brown), (dog,on,grass), (grass,)};
        # ref union {(dog,), (dog,brown), (dog,run on,grass), (grass,)}:
        # the relation tuples differ, so p = r = 3/4 -> F1 = 75
        got = spice(
            ["a brown dog on the grass"],
            [["a brown dog runs on the grass", "the dog is brown"]],
        )
        assert got == pytest.approx(75.0, abs=1e-9)
        # mean over images
        two = spice(
            ["a brown dog", "blue car"],
            [["a brown dog"], ["red bicycle"]],
        )
        assert two == pytest.approx(50.0)

    def test_metric_ranking_agreement(self):
        """VERDICT r4 weak #5: our METEOR/SPICE deviate numerically from
        the reference's Java implementations (documented, PARITY.md) —
        what downstream users rely on is RANKING agreement when
        comparing captioning systems.  Four systems of graded quality
        (exact > close paraphrase > partial > unrelated) over a shared
        6-image reference set must be ranked strictly monotonically by
        EVERY metric family the evaluator reports."""
        from peft_vit_tpu.engine.caption_metrics import (
            coco_caption_metrics,
        )

        refs = [
            ["a black dog runs across the green field"],
            ["a man rides a red bicycle down the street"],
            ["two children play with a ball on the beach"],
            ["a woman reads a book under a large tree"],
            ["a cat sleeps on the warm window sill"],
            ["a group of birds flies over the calm lake"],
        ]
        systems = {
            "exact": [r[0] for r in refs],
            "close": [
                "a black dog runs across a green field",
                "a man rides a red bicycle on the street",
                "two children play with a ball at the beach",
                "a woman reads a book under a big tree",
                "a cat sleeps on a warm window sill",
                "a group of birds flies above the calm lake",
            ],
            "partial": [
                "a dog in a field",
                "a man on the street",
                "children on the beach",
                "a woman under a tree",
                "a cat on the sill",
                "birds over a lake",
            ],
            "unrelated": [
                "purple elephants juggle quantum mathematics",
                "seventeen submarines whistle backwards",
                "the spreadsheet devoured its own columns",
                "gravity tastes like tuesday",
                "mountains negotiate with parked cars",
                "a theorem of soup and velvet",
            ],
        }
        scores = {
            name: coco_caption_metrics(
                caps, refs, metrics="Bleu,METEOR,ROUGE_L,CIDEr,SPICE"
            )
            for name, caps in systems.items()
        }
        order = ["exact", "close", "partial", "unrelated"]
        for metric in ("Bleu_1", "METEOR", "ROUGE_L", "CIDEr", "SPICE"):
            vals = [scores[s][metric] for s in order]
            assert all(
                a > b for a, b in zip(vals, vals[1:])
            ), (metric, dict(zip(order, vals)))

    def test_cider_rewards_specificity(self):
        from peft_vit_tpu.engine.caption_metrics import cider_d

        refs = [
            ["a photo of a golden retriever"],
            ["a photo of a sports car"],
            ["a photo of a mountain lake"],
        ]
        specific = [
            "a photo of a golden retriever",
            "a photo of a sports car",
            "a photo of a mountain lake",
        ]
        generic = ["a photo of a", "a photo of a", "a photo of a"]
        assert cider_d(specific, refs) > cider_d(generic, refs)


class TestSubmission:
    def test_roundtrip(self, tmp_path):
        sub = PredictionSubmission(
            dataset_name="cifar-10",
            model_name="vitb32_CLIP",
            task="classification_multiclass",
            predictions=[[0.1, 0.9], [0.8, 0.2]],
            num_shots=5,
        )
        p = str(tmp_path / "sub.json")
        submit_predictions(sub, p)
        back = PredictionSubmission.load(p)
        assert back.dataset_name == "cifar-10"

    def test_rejects_bad(self):
        with pytest.raises(ValueError):
            PredictionSubmission(
                dataset_name="x",
                model_name="m",
                task="segmentation",
                predictions=[[0.0]],
            ).validate()
        with pytest.raises(ValueError):
            PredictionSubmission(
                dataset_name="x",
                model_name="m",
                task="classification_multiclass",
                predictions=[[float("nan")]],
            ).validate()


class TestCustomDatasets:
    def test_voc_parsing(self, tmp_path):
        main = tmp_path / "ImageSets" / "Main"
        main.mkdir(parents=True)
        (main / "aeroplane_train.txt").write_text(
            "img001  1\nimg002 -1\nimg003  0\n"
        )
        (main / "dog_train.txt").write_text(
            "img001 -1\nimg002  1\nimg003 -1\n"
        )
        paths, labels = voc2007_classification(str(tmp_path), "train")
        assert len(paths) == 3
        aero = VOC_CLASSES.index("aeroplane")
        dog = VOC_CLASSES.index("dog")
        assert labels[0, aero] == 1 and labels[0, dog] == 0
        assert labels[1, dog] == 1
        assert labels[2, aero] == 1  # difficult (0) counts positive

    def test_chestx_parsing(self, tmp_path):
        (tmp_path / "Data_Entry_2017.csv").write_text(
            "Image Index,Finding Labels,other\n"
            "a.png,Cardiomegaly|Effusion,x\n"
            "b.png,No Finding,x\n"
        )
        paths, labels = chestxray8(str(tmp_path), "train")
        assert len(paths) == 2
        assert labels[0, CHESTX_CLASSES.index("Cardiomegaly")] == 1
        assert labels[1].sum() == 0

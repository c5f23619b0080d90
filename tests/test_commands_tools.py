"""CLI tools: pvt_model_summary and pvt_test (reference
tools/model_summary.py, tools/test.py, tools/test_clip_retrieval.py,
commands/image_caption_eval.py)."""

import json

import numpy as np
import pytest


class TestModelSummary:
    def test_summary_lora_tiny(self, capsys):
        from peft_vit_tpu.commands.model_summary import main

        out = main(
            [
                "--method",
                "lora",
                "MODEL.SPEC.VISION.LAYERS",
                "1",
                "MODEL.SPEC.VISION.WIDTH",
                "64",
                "MODEL.SPEC.VISION.HEADS",
                "2",
                "MODEL.SPEC.VISION.PATCH_SIZE",
                "16",
                "MODEL.SPEC.EMBED_DIM",
                "32",
                "MODEL.SPEC.TEXT.WIDTH",
                "32",
                "MODEL.SPEC.TEXT.LAYERS",
                "1",
                "MODEL.SPEC.TEXT.HEADS",
                "2",
                "TRAIN.IMAGE_SIZE",
                "[32, 32]",
                "DATASET.NUM_CLASSES",
                "3",
            ]
        )
        assert "total params:" in out
        assert "trainable:" in out
        assert "forward FLOPs" in out and "grad FLOPs" in out
        # LoRA: tiny trainable fraction, frozen rows present
        assert "frozen" in out and "train" in out

    def test_summary_with_scaling_table(self):
        from peft_vit_tpu.commands.model_summary import main

        out = main(
            [
                "--method",
                "lora",
                "--scaling",
                "--batch",
                "8",
                "MODEL.SPEC.VISION.LAYERS",
                "1",
                "MODEL.SPEC.VISION.WIDTH",
                "64",
                "MODEL.SPEC.VISION.HEADS",
                "2",
                "MODEL.SPEC.VISION.PATCH_SIZE",
                "16",
                "MODEL.SPEC.EMBED_DIM",
                "32",
                "MODEL.SPEC.TEXT.WIDTH",
                "32",
                "MODEL.SPEC.TEXT.LAYERS",
                "1",
                "MODEL.SPEC.TEXT.HEADS",
                "2",
                "TRAIN.IMAGE_SIZE",
                "[32, 32]",
                "DATASET.NUM_CLASSES",
                "3",
            ]
        )
        assert "PREDICTED multi-chip scaling" in out
        assert "| dp | 256 |" in out


class TestTestModelCommand:
    def test_retrieval_mode(self, tmp_path, capsys):
        from peft_vit_tpu.commands.test_model import main

        rng = np.random.RandomState(0)
        feats = rng.randn(8, 16).astype(np.float32)
        # identical features -> perfect retrieval
        p = tmp_path / "f.npz"
        np.savez(p, image_feats=feats, text_feats=feats)
        out = main(["--mode", "retrieval", "--features", str(p)])
        assert out["i2t_R@1"] == 100.0
        assert out["t2i_median_rank"] == 1.0
        printed = json.loads(capsys.readouterr().out.strip())
        assert printed["i2t_R@5"] == 100.0

    def test_real_mode(self, tmp_path):
        from peft_vit_tpu.commands.test_model import main

        scores = np.eye(4, dtype=np.float32)  # pred = [0, 1, 2, 3]
        sp = tmp_path / "s.npz"
        np.savez(sp, scores=scores)
        rp = tmp_path / "r.json"
        rp.write_text(json.dumps([[0], [9], [], [3, 1]]))
        out = main(
            ["--mode", "real", "--scores", str(sp), "--real-labels", str(rp)]
        )
        # 3 scored images (one skipped), 2 correct
        assert out["real_top1"] == pytest.approx(100.0 * 2 / 3)

    def test_valid_mode(self, tmp_path):
        from peft_vit_tpu.commands.test_model import main

        scores = np.array(
            [[9.0, 0.0, 1.0, 5.0], [0.0, 1.0, 9.0, 5.0]], np.float32
        )
        sp = tmp_path / "s.npz"
        np.savez(sp, scores=scores, target=np.array([3, 2]))
        out = main(
            ["--mode", "valid", "--scores", str(sp), "--valid-labels", "2,3"]
        )
        # restricted to classes {2, 3}: preds become [3, 2] -> 100%
        assert out["valid_top1"] == 100.0

    def test_caption_mode(self, tmp_path):
        from peft_vit_tpu.commands.test_model import main

        rp = tmp_path / "refs.json"
        rp.write_text(json.dumps([["a photo"], ["a photo of a cat"]]))
        out = main(["--mode", "caption", "--references", str(rp)])
        assert set(
            ["Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"]
        ) <= set(out)
        assert out["Bleu_1"] > 0


class TestDebugRun:
    """pvt_debug: the unified driver under debug forensics — the
    TPU-native replacement for the reference's scratch debugging
    driver (commands/debugging.py, evaluation/debugging.py:549-620)."""

    _TINY = [
        "--method", "lora", "--lr", "0.02",
        "DATASET.DATASET", "synthetic",
        "DATASET.NUM_CLASSES", "4",
        "DATASET.NUM_SAMPLES_PER_CLASS", "8",
        "TRAIN.IMAGE_SIZE", "[16,16]",
        "TRAIN.BATCH_SIZE_PER_GPU", "8",
        "TRAIN.SCHEDULE", "[]",
        "MODEL.NAME", "clip_tiny",
        "MODEL.SPEC.EMBED_DIM", "32",
        "MODEL.SPEC.VISION.PATCH_SIZE", "8",
        "MODEL.SPEC.VISION.WIDTH", "32",
        "MODEL.SPEC.VISION.LAYERS", "1",
        "MODEL.SPEC.VISION.HEADS", "2",
    ]

    def test_debug_run_e2e(self, tmp_path, monkeypatch):
        import jax

        from peft_vit_tpu.commands.debug_run import main

        monkeypatch.chdir(tmp_path)
        np.random.seed(0)
        score = main(self._TINY + ["OUTPUT_DIR", str(tmp_path)])
        # debug mode defaults: sweep off, one epoch, anomaly detection
        # armed; the run completes and returns a valid accuracy
        assert 0.0 <= score <= 100.0
        assert jax.config.jax_debug_nans
        jax.config.update("jax_debug_nans", False)

    def test_debug_run_flags_parse(self):
        import argparse

        from peft_vit_tpu.commands import debug_run
        from peft_vit_tpu.commands.common import add_finetuning_args

        parser = argparse.ArgumentParser()
        add_finetuning_args(parser)
        parser.add_argument("--no-jit", dest="no_jit", action="store_true")
        parser.add_argument(
            "--check-leaks", dest="check_leaks", action="store_true"
        )
        parser.add_argument("--full", action="store_true")
        args = parser.parse_args(["--no-jit", "--check-leaks", "--full"])
        assert args.no_jit and args.check_leaks and args.full
        assert callable(debug_run.main)

"""Protocol-fidelity check against the reference's shipped sample log
(VERDICT r2 next-round #10).

``tests/golden/reference_log_cifar10_finetuning_5_rank0.txt`` is a
VERBATIM copy of the reference's golden artifact
(few_shot/vision_benchmark/test/vitb32_CLIP/log_random_0/cifar-10/
finetuning_5_2022-07-30-23-58_rank0.txt) — constant test data, checked in
deliberately so the schema assertion runs offline.

The test runs the CIFAR-10-shaped flagship protocol (5-shot, balanced
80/20 val split, lr x wd sweep, merged-trainval final run) through the
public driver and asserts ``utils.results.parse_protocol`` recovers the
SAME schema from our log and from the reference's log: the split-size
line, the hyperparameter line, the final-classifier marker, and the
trainval merge size.
"""

import glob
import os

import numpy as np
import pytest

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.utils.results import parse_protocol, read_log_results

GOLDEN = os.path.join(
    os.path.dirname(__file__),
    "golden",
    "reference_log_cifar10_finetuning_5_rank0.txt",
)


class TestReferenceLogSchema:
    def test_reference_log_parses(self):
        got = parse_protocol(GOLDEN)
        # CIFAR-10 5-shot: 40 train / 10 val (the 80/20 balanced split),
        # 50 after the trainval merge — exactly the sample log's values
        assert got["train_size"] == 40.0
        assert got["val_size"] == 10.0
        assert got["trainval_size"] == 50.0
        assert got["learning_rate"] == pytest.approx(0.001)
        assert got["l2_lambda"] == pytest.approx(0.316)
        assert got["final_training"] is True
        # the sample log is truncated mid-run: no final accuracy line
        assert "accuracy" not in got

    def test_read_results_skips_truncated_log(self):
        """The reference's own reader skips logs without a final accuracy
        line (read_results.py:63-84 try/except) — so must ours."""
        accs, _ = read_log_results(
            os.path.dirname(GOLDEN),
            "",
            "reference_log_cifar10_finetuning_5_",
        )
        assert accs == []


class TestOwnLogSchema:
    def test_flagship_run_emits_reference_schema(self, tmp_path):
        """CIFAR-10-shaped 5-shot flagship run -> our log parses to the
        same schema as the reference's golden log."""
        from peft_vit_tpu.commands.run import finetune_main
        from peft_vit_tpu.utils.logging import create_logger

        cfg = get_default_config()
        cfg.OUTPUT_DIR = str(tmp_path)
        cfg.DATASET.DATASET = "synthetic"
        cfg.DATASET.NUM_CLASSES = 10
        cfg.DATASET.NUM_SAMPLES_PER_CLASS = 5  # 5-shot
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.TRAIN.BATCH_SIZE_PER_GPU = 10
        cfg.TRAIN.END_EPOCH = 2
        cfg.TRAIN.SCHEDULE = []
        # small wd grid (3 points, coarse=3) keeps CPU time sane while
        # still exercising the sweep -> final-run protocol
        cfg.TRAIN.SEARCH_WD_POINTS = 3
        cfg.TRAIN.SEARCH_WD_INIT_POINTS = 3
        cfg.MODEL.NAME = "clip_tiny"
        cfg.MODEL.SPEC.EMBED_DIM = 32
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
        cfg.MODEL.SPEC.VISION.WIDTH = 32
        cfg.MODEL.SPEC.VISION.LAYERS = 2
        cfg.MODEL.SPEC.VISION.HEADS = 2
        cfg.PEFT.METHOD = "linear"
        cfg.NAME = "protocol"
        create_logger(cfg, "finetuning_5")
        score = finetune_main(cfg)
        assert np.isfinite(score)

        logs = glob.glob(
            str(tmp_path / "synthetic" / "protocol" / "finetuning_5_*.txt")
        )
        assert logs, "reference-shaped log file written"
        got = parse_protocol(logs[0])
        ref = parse_protocol(GOLDEN)
        # same schema keys recovered from both logs
        for key in (
            "train_size",
            "val_size",
            "trainval_size",
            "learning_rate",
            "l2_lambda",
        ):
            assert key in got and key in ref, key
        assert got["final_training"] is True
        # 10-way 5-shot, 80/20: 40 train / 10 val / 50 merged — the same
        # protocol arithmetic as the reference's CIFAR-10 sample
        assert got["train_size"] == 40.0
        assert got["val_size"] == 10.0
        assert got["trainval_size"] == 50.0
        # ours additionally carries the final accuracy + param marker
        assert "accuracy" in got
        assert "trainable_params_m" in got
        accs, params = read_log_results(
            str(tmp_path), "synthetic", "finetuning_5_"
        )
        assert len(accs) == 1 and accs[0] == pytest.approx(
            got["accuracy"]
        )

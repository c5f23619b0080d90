"""Coverage for utils/xprof.py + the ``pvt_profile`` command.

Reference analog: the reference answers "where does the step's time go"
with CUDA profiler habits + tensorwatch stats (lib/utils/modelsummary.py);
here a jax.profiler xplane capture is summarized through xprof's
op_profile tool.  CPU traces carry no device-op metrics, so these tests
cover the capture plumbing and the table/walk logic; the real per-fusion
output is validated on TPU (BASELINE.md round-3 tables came from it).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.utils.xprof import (
    capture_trace,
    find_xplane,
    format_op_profile,
    parse_op_profile,
)

FAKE = {
    "categories": [
        {
            "name": "convolution fusion",
            "depth": 1,
            "time_frac": 0.81,
            "tf_s": 159.0,
            "mxu_util": 0.48,
            "hbm_bw_util": 0.26,
            "occurrences": 4962,
        },
        {
            "name": "copy-done",
            "depth": 1,
            "time_frac": 0.06,
            "tf_s": 0.0,
            "mxu_util": 0.0,
            "hbm_bw_util": 1.0,
            "occurrences": 12544,
        },
    ],
    "ops": [
        {
            "name": "fusion.3635",
            "depth": 2,
            "time_frac": 0.031,
            "tf_s": 120.0,
            "mxu_util": 0.07,
            "hbm_bw_util": 0.4,
            "occurrences": 12,
        }
    ],
}


class TestFormat:
    def test_table_contains_categories_and_ops(self):
        out = format_op_profile(FAKE, top=5)
        assert "convolution fusion" in out
        assert "81.0" in out
        assert "copy-done" in out
        assert "fusion.3635" in out

    def test_empty_profile_notes_no_device_plane(self):
        out = format_op_profile({"categories": [], "ops": []})
        assert "no device-op metrics" in out

    def test_top_limits_op_rows(self):
        many = dict(FAKE)
        many["ops"] = [
            dict(FAKE["ops"][0], name=f"fusion.{i}") for i in range(30)
        ]
        out = format_op_profile(many, top=3)
        assert out.count("fusion.") == 3


class TestCapture:
    def test_capture_trace_writes_xplane(self, tmp_path):
        f = jax.jit(lambda x: (x * 2.0).sum())
        x = jnp.ones((64, 64))
        path = capture_trace(
            lambda: f(x), str(tmp_path / "trace"), steps=1, warmup=1
        )
        # the profiler must emit a capture even on CPU-only backends
        assert path is not None and path.endswith(".xplane.pb")
        assert os.path.getsize(path) > 0
        assert find_xplane(str(tmp_path / "trace")) == path

    def test_parse_cpu_trace_yields_no_device_ops(self, tmp_path):
        """op_profile over a CPU capture parses but has no device plane
        (the real table is TPU-only — see BASELINE.md)."""
        f = jax.jit(lambda x: (x @ x).sum())
        x = jnp.ones((32, 32))
        path = capture_trace(
            lambda: f(x), str(tmp_path / "trace"), steps=1
        )
        try:
            profile = parse_op_profile(path)
        except RuntimeError as e:
            pytest.skip(f"xprof conversion tooling unavailable: {e}")
        assert profile["categories"] == []
        assert profile["ops"] == []


class TestBuildStep:
    def test_train_step_runs_and_returns_loss(self):
        from peft_vit_tpu.commands.profile import build_step
        from peft_vit_tpu.config import get_default_config

        cfg = get_default_config()
        cfg.merge_from_list(
            [
                "TRAIN.IMAGE_SIZE",
                "[32,32]",
                "MODEL.SPEC.VISION.WIDTH",
                "64",
                "MODEL.SPEC.VISION.LAYERS",
                "1",
                "MODEL.SPEC.VISION.HEADS",
                "2",
                "MODEL.SPEC.VISION.PATCH_SIZE",
                "16",
                "MODEL.NUM_CLASSES",
                "4",
            ]
        )
        cfg.freeze()
        step = build_step(cfg, "lora", batch=2, mode="train", k_chain=2)
        l1 = float(step())
        l2 = float(step())
        assert np.isfinite(l1) and np.isfinite(l2)
        assert l2 != l1  # state advanced between dispatches

    def test_train_step_int8_dx_mirrors_trainer_wiring(self):
        """Under TPU.INT8_FWD_TRAIN (+ INT8_BWD_DX) the profiled step
        consumes the per-RUN pre-quantized tree exactly like the
        Trainer (_frozen_qk), so pvt_profile measures the production
        int8 step."""
        from peft_vit_tpu.commands.profile import build_step
        from peft_vit_tpu.config import get_default_config

        cfg = get_default_config()
        cfg.merge_from_list(
            [
                "TRAIN.IMAGE_SIZE", "[32,32]",
                "MODEL.SPEC.VISION.WIDTH", "64",
                "MODEL.SPEC.VISION.LAYERS", "1",
                "MODEL.SPEC.VISION.HEADS", "2",
                "MODEL.SPEC.VISION.PATCH_SIZE", "16",
                "MODEL.NUM_CLASSES", "4",
                "TPU.INT8_FWD_TRAIN", "True",
                "TPU.INT8_BWD_DX", "True",
            ]
        )
        cfg.freeze()
        step = build_step(cfg, "lora", batch=2, mode="train", k_chain=2)
        l1 = float(step())
        l2 = float(step())
        assert np.isfinite(l1) and np.isfinite(l2)
        assert l2 != l1


class TestCommand:
    def test_profile_cli_runs_on_cpu(self, tmp_path, capsys):
        from peft_vit_tpu.commands.profile import main

        main(
            [
                "--batch",
                "2",
                "--k-chain",
                "1",
                "--steps",
                "1",
                "--mode",
                "eval",
                "--logdir",
                str(tmp_path / "prof"),
                "TRAIN.IMAGE_SIZE",
                "[32,32]",
                "MODEL.SPEC.VISION.WIDTH",
                "64",
                "MODEL.SPEC.VISION.LAYERS",
                "1",
                "MODEL.SPEC.VISION.HEADS",
                "2",
                "MODEL.SPEC.VISION.PATCH_SIZE",
                "16",
                "MODEL.NUM_CLASSES",
                "4",
            ]
        )
        out = capsys.readouterr().out
        assert "trace:" in out or "no xplane" in out

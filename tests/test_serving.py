"""Export + serving (engine/serving.py, commands/export_model.py).

The reference ships no serving path; these tests pin the TPU rebuild's
deployment story: batch-polymorphic StableHLO export, code-free reload,
bucketed AOT serving, and the int8 frozen-tower serving variant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.engine.serving import (
    ServingSession,
    export_classifier,
    load_exported,
    make_infer_fn,
)
from peft_vit_tpu.models.factory import build_image_classifier
from peft_vit_tpu.peft import spec_from_config


def tiny_cfg(**over):
    cfg = get_default_config()
    cfg.DATASET.NUM_CLASSES = 5
    cfg.TRAIN.IMAGE_SIZE = [16, 16]
    cfg.MODEL.NAME = "clip_tiny"
    cfg.MODEL.SPEC.EMBED_DIM = 32
    cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
    cfg.MODEL.SPEC.VISION.WIDTH = 32
    cfg.MODEL.SPEC.VISION.LAYERS = 2
    cfg.MODEL.SPEC.VISION.HEADS = 2
    for k, v in over.items():
        node = cfg
        *parents, leaf = k.split(".")
        for pk in parents:
            node = node[pk]
        node[leaf] = v
    return cfg


@pytest.fixture(scope="module")
def built():
    cfg = tiny_cfg()
    model, variables, _ = build_image_classifier(
        cfg, spec_from_config(cfg), 5
    )
    return cfg, model, variables


class TestExport:
    def test_roundtrip_batch_polymorphic(self, built, tmp_path):
        cfg, model, variables = built
        path = str(tmp_path / "m.stablehlo")
        data = export_classifier(model, variables, 16, path=path)
        assert len(data) > 0
        served = load_exported(path)
        rng = np.random.RandomState(0)
        for n in (1, 3, 7):  # one artifact, several batch sizes
            x = jnp.asarray(rng.randn(n, 16, 16, 3).astype(np.float32))
            want = model.apply(variables, x, False)
            got = served(x)
            assert got.shape == (n, 5)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-4
            )

    def test_multiplatform_artifact(self, built, tmp_path):
        """platforms=(cpu, tpu): jax.export cross-lowers for TPU without
        a TPU attached; the one artifact records both platforms and
        still executes on the CPU backend."""
        from jax import export as jexport

        cfg, model, variables = built
        path = str(tmp_path / "multi.stablehlo")
        data = export_classifier(
            model, variables, 16, path=path, platforms=("cpu", "tpu")
        )
        exported = jexport.deserialize(bytearray(data))
        assert set(exported.platforms) == {"cpu", "tpu"}
        served = load_exported(path)
        x = jnp.zeros((3, 16, 16, 3), jnp.float32)
        want = model.apply(variables, x, False)
        np.testing.assert_allclose(
            np.asarray(served(x)), np.asarray(want), atol=1e-4
        )

    def test_loads_from_bytes_without_model_code(self, built):
        cfg, model, variables = built
        data = export_classifier(model, variables, 16)
        served = load_exported(data)
        x = jnp.zeros((2, 16, 16, 3), jnp.float32)
        assert served(x).shape == (2, 5)

    def test_export_cli_with_check(self, built, tmp_path):
        from peft_vit_tpu.commands.export_model import export_main

        cfg, _, _ = built
        cfg = tiny_cfg()
        cfg.freeze()
        out = str(tmp_path / "cli.stablehlo")
        data = export_main(cfg, "full", out, check=True)
        assert len(data) > 0

    def test_export_restores_trained_checkpoint(self, tmp_path):
        # a tuned LoRA subtree saved by the trainer must be grafted into
        # the exported artifact
        from peft_vit_tpu.commands.export_model import export_main
        from peft_vit_tpu.engine.checkpoint import save_checkpoint
        from peft_vit_tpu.peft import build_mask, split_params

        cfg = tiny_cfg(**{"PEFT.METHOD": "lora"})
        model, variables, _ = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        params = variables["params"]
        mask = build_mask(params, "lora", num_layers=2)
        trainable, frozen = split_params(params, mask)
        # "train": shift every trainable leaf so the export must differ
        trained = jax.tree_util.tree_map(lambda t: t + 0.05, trainable)
        ckpt = str(tmp_path / "ckpt")
        save_checkpoint(ckpt, 0, {"trainable": trained})

        out = str(tmp_path / "lora.stablehlo")
        cfg.freeze()
        export_main(cfg, "lora", out, checkpoint=ckpt, check=True)
        served = load_exported(out)
        x = jnp.asarray(
            np.random.RandomState(1).randn(2, 16, 16, 3).astype(np.float32)
        )
        fresh = model.apply(variables, x, False)
        got = served(x)
        assert not np.allclose(np.asarray(got), np.asarray(fresh), atol=1e-5)

    def test_missing_checkpoint_raises(self, built, tmp_path):
        from peft_vit_tpu.commands.export_model import export_main

        cfg = tiny_cfg()
        cfg.freeze()
        with pytest.raises(FileNotFoundError):
            export_main(
                cfg,
                "full",
                str(tmp_path / "x.stablehlo"),
                checkpoint=str(tmp_path / "nope"),
            )


class TestServingSession:
    def test_bucketed_predict_matches_direct(self, built):
        cfg, model, variables = built
        sess = ServingSession(
            model, variables, 16, buckets=(2, 4), dtype=jnp.float32
        )
        rng = np.random.RandomState(2)
        infer = jax.jit(make_infer_fn(model, variables))
        # n exercises: exact bucket, padded, and split-into-chunks
        for n in (2, 3, 4, 9):
            x = rng.randn(n, 16, 16, 3).astype(np.float32)
            got = sess.predict(x)
            want = np.asarray(infer(jnp.asarray(x)), np.float32)
            assert got.shape == (n, 5)
            np.testing.assert_allclose(got, want, atol=1e-4)

    def test_int8_session_close_to_f32(self):
        # TPU.INT8_INFERENCE builds Int8Dense layers; the session must
        # serve them and stay within quantization tolerance
        cfg = tiny_cfg(**{"TPU.INT8_INFERENCE": True})
        model8, variables8, _ = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        cfg_f = tiny_cfg()
        model_f, variables_f, _ = build_image_classifier(
            cfg_f, spec_from_config(cfg_f), 5
        )
        sess = ServingSession(model8, variables8, 16, buckets=(4,))
        x = np.random.RandomState(3).randn(4, 16, 16, 3).astype(np.float32)
        got8 = sess.predict(x)
        want = np.asarray(
            model_f.apply(variables_f, jnp.asarray(x), False), np.float32
        )
        cos = float(
            (got8.ravel() @ want.ravel())
            / (np.linalg.norm(got8) * np.linalg.norm(want) + 1e-9)
        )
        assert cos > 0.99, cos

    def test_empty_request_rejected(self, built):
        cfg, model, variables = built
        sess = ServingSession(model, variables, 16, buckets=(1,))
        with pytest.raises(ValueError):
            sess.predict(np.zeros((0, 16, 16, 3), np.float32))

"""int8 frozen-tower inference (VERDICT r2 next-round #3).

Weight per-channel + activation per-token symmetric int8, int32 MXU
accumulation (ops/int8.py).  Acceptance: logit cosine vs the float path
> 0.999; the training path must be bit-identical with the flag on
(int8 only engages on deterministic forwards).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.ops.int8 import Int8Dense, int8_matmul
from peft_vit_tpu.peft import PEFTSpec


def cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestInt8Matmul:
    def test_matches_float_matmul(self):
        rng = np.random.RandomState(0)
        x = rng.randn(64, 96).astype(np.float32)
        w = rng.randn(96, 48).astype(np.float32) * 0.05
        got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
        want = x @ w
        assert cos(got, want) > 0.9995
        rel = np.abs(got - want).mean() / np.abs(want).mean()
        assert rel < 0.02, rel

    def test_outlier_rows_use_own_scale(self):
        # per-token scaling: a 100x outlier row must not destroy the
        # quantization of the other rows
        rng = np.random.RandomState(1)
        x = rng.randn(8, 32).astype(np.float32)
        x[0] *= 100.0
        w = rng.randn(32, 16).astype(np.float32) * 0.1
        got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
        want = x @ w
        assert cos(got[1:], want[1:]) > 0.999

    def test_int8_dense_param_compatible(self):
        """Int8Dense exposes the exact nn.Dense param tree — checkpoints
        and PEFT masks are oblivious to the quantized class."""
        from flax import linen as nn

        x = jnp.ones((4, 32))
        a = nn.Dense(16)
        b = Int8Dense(16)
        pa = a.init(jax.random.PRNGKey(0), x)["params"]
        pb = b.init(jax.random.PRNGKey(0), x)["params"]
        assert jax.tree_util.tree_structure(pa) == (
            jax.tree_util.tree_structure(pb)
        )
        # same params -> near-identical outputs
        ya = a.apply({"params": pa}, x)
        yb = b.apply({"params": pa}, x)
        assert cos(ya, yb) > 0.999


class TestInt8ViT:
    def _model(self, int8):
        vit = VisionTransformer(
            image_size=16,
            patch_size=8,
            width=64,
            layers=2,
            heads=2,
            style="clip",
            output_dim=32,
            spec=PEFTSpec(),
            use_flash=False,
            int8=int8,
        )
        return ImageClassifier(backbone=vit, num_classes=5)

    def test_eval_logits_parity(self):
        """The VERDICT acceptance: logit cos > 0.999 on the no-grad path."""
        x0 = jnp.zeros((1, 16, 16, 3))
        params = self._model(False).init(jax.random.PRNGKey(0), x0)[
            "params"
        ]
        x = jnp.asarray(
            np.random.RandomState(0).randn(8, 16, 16, 3), jnp.float32
        )
        fp = self._model(False).apply({"params": params}, x, False)
        q = self._model(True).apply({"params": params}, x, False)
        assert cos(fp, q) > 0.999, cos(fp, q)

    def test_train_path_untouched(self):
        """int8 gates on deterministic: train forwards + grads are
        bit-identical whether the flag is set or not."""
        x0 = jnp.zeros((1, 16, 16, 3))
        params = self._model(False).init(jax.random.PRNGKey(0), x0)[
            "params"
        ]
        x = jnp.asarray(
            np.random.RandomState(1).randn(4, 16, 16, 3), jnp.float32
        )
        y = jnp.asarray([0, 1, 2, 3])

        def loss(model):
            def f(p):
                logits = model.apply({"params": p}, x, True)
                lp = jax.nn.log_softmax(logits)
                return -jnp.mean(
                    jnp.take_along_axis(lp, y[:, None], axis=-1)
                )
            return jax.value_and_grad(f)(params)

        l_fp, g_fp = loss(self._model(False))
        l_q, g_q = loss(self._model(True))
        assert float(l_fp) == float(l_q)
        for a, b in zip(
            jax.tree_util.tree_leaves(g_fp), jax.tree_util.tree_leaves(g_q)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_factory_flag(self):
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import spec_from_config

        cfg = get_default_config()
        cfg.TPU.INT8_INFERENCE = True
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.MODEL.NAME = "clip_tiny"
        cfg.MODEL.SPEC.EMBED_DIM = 32
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
        cfg.MODEL.SPEC.VISION.WIDTH = 32
        cfg.MODEL.SPEC.VISION.LAYERS = 2
        cfg.MODEL.SPEC.VISION.HEADS = 2
        model, variables, _ = build_image_classifier(
            cfg, spec_from_config(cfg), 5
        )
        assert model.backbone.int8 is True
        x = jnp.zeros((2, 16, 16, 3))
        out = model.apply(
            {"params": variables["params"]}, x, False
        )
        assert np.isfinite(np.asarray(out)).all()

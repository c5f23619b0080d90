"""Swin backbone + contrastive path + summary tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from peft_vit_tpu.engine.contrastive import (
    clip_contrastive_step_fn,
    contrastive_eval_logits,
    hybrid_contrastive_step_fn,
)
from peft_vit_tpu.models.swin import (
    SwinTransformer,
    window_merge,
    window_partition,
)
from peft_vit_tpu.peft import PEFTSpec, build_mask
from peft_vit_tpu.utils.summary import flops_of, param_summary


class TestSwin:
    def test_window_roundtrip(self):
        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        w = window_partition(x, 4)
        assert w.shape == (2 * 4, 16, 3)
        back = window_merge(w, 4, 8, 8)
        np.testing.assert_array_equal(back, x)

    def test_forward_shapes(self):
        m = SwinTransformer(
            image_size=32,
            patch_size=4,
            embed_dim=16,
            depths=(1, 1),
            num_heads=(2, 4),
            window_size=4,
            use_flash=False,
        )
        x = jnp.ones((2, 32, 32, 3))
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        out = m.apply({"params": p}, x)
        assert out.shape == (2, 32)  # dim doubles once

    def test_shifted_block_differs_and_is_finite(self):
        kwargs = dict(
            image_size=32,
            patch_size=4,
            embed_dim=16,
            num_heads=(2,),
            window_size=4,
            use_flash=False,
        )
        m = SwinTransformer(depths=(2,), **kwargs)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        out = m.apply({"params": p}, x)
        assert bool(jnp.isfinite(out).all())

    def test_rpb_mask_applies_to_swin(self):
        """The 'rpb' trainable filter selects Swin's relative position
        bias tables (reference RPB method on the Swin family)."""
        m = SwinTransformer(
            image_size=32,
            patch_size=4,
            embed_dim=16,
            depths=(1,),
            num_heads=(2,),
            window_size=4,
            use_flash=False,
        )
        x = jnp.ones((1, 32, 32, 3))
        p = m.init(jax.random.PRNGKey(0), x)["params"]
        mask = build_mask(p, "rpb", num_layers=1, train_head=False)
        flat = traverse_util.flatten_dict(mask, sep="/")
        chosen = [k for k, v in flat.items() if v]
        assert chosen and all(
            "relative_position_bias_table" in k for k in chosen
        )

    def test_lora_injects_into_swin(self):
        spec = PEFTSpec(method="lora", attn_delta="lora", lora_rank=2)
        m = SwinTransformer(
            image_size=32,
            patch_size=4,
            embed_dim=16,
            depths=(1,),
            num_heads=(2,),
            window_size=4,
            spec=spec,
            use_flash=False,
        )
        p = m.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)))[
            "params"
        ]
        flat = traverse_util.flatten_dict(p, sep="/")
        assert any("q_adapter1" in k for k in flat)


class TestContrastive:
    def test_clip_contrastive_loss_decreases_grad(self):
        d = 8

        def enc_img(params, x):
            return x @ params["wi"]

        def enc_txt(params, t):
            return t @ params["wt"]

        rng = np.random.RandomState(0)
        params = {
            "wi": jnp.asarray(rng.randn(4, d), jnp.float32),
            "wt": jnp.asarray(rng.randn(4, d), jnp.float32),
        }
        imgs = jnp.asarray(rng.randn(6, 4), jnp.float32)
        toks = jnp.asarray(rng.randn(6, 4), jnp.float32)
        loss_fn = clip_contrastive_step_fn(enc_img, enc_txt)
        scale = jnp.asarray(np.log(1 / 0.07), jnp.float32)
        l0 = float(loss_fn(params, imgs, toks, scale))
        g = jax.grad(lambda p: loss_fn(p, imgs, toks, scale))(params)
        p2 = jax.tree_util.tree_map(lambda a, b: a - 0.1 * b, params, g)
        l1 = float(loss_fn(p2, imgs, toks, scale))
        assert l1 < l0

    def test_hybrid_same_class_positive(self):
        def enc_img(params, x):
            return x

        loss_fn = hybrid_contrastive_step_fn(enc_img)
        text_feats = jnp.eye(3)
        # images already aligned to their class text
        imgs = text_feats[jnp.asarray([0, 1, 2, 0])]
        labels = jnp.asarray([0, 1, 2, 0])
        aligned = float(
            loss_fn({}, text_feats, imgs, labels, jnp.asarray(2.0))
        )
        shuffled = float(
            loss_fn(
                {},
                text_feats,
                imgs,
                jnp.asarray([1, 2, 0, 1]),
                jnp.asarray(2.0),
            )
        )
        assert aligned < shuffled

    def test_eval_logits(self):
        txt = jnp.eye(3)
        img = txt[jnp.asarray([2, 0])] * 5.0
        logits = contrastive_eval_logits(img, txt)
        assert (jnp.argmax(logits, -1) == jnp.asarray([2, 0])).all()


class TestSummary:
    def test_param_summary_counts(self):
        params = {"a": {"w": jnp.zeros((3, 4))}, "b": jnp.zeros((5,))}
        s = param_summary(params)
        assert "17" in s.replace(",", "")

    def test_flops_counts_matmul(self):
        f = lambda x: x @ x
        x = jnp.zeros((64, 64))
        fl = flops_of(f, x)
        assert fl >= 2 * 64**3 * 0.9


# --- custom-model extension contract --------------------------------------


def _tiny_custom_builder(cfg, spec, num_classes, rng):
    """module:function-path builder (see class below for the decorator
    form) — the TPU analog of the reference's get_cls_model contract
    (models/cls_example.py:4-17)."""
    from flax import linen as nn

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = x.reshape(x.shape[0], -1)
            return nn.Dense(num_classes)(x)

    model = TinyNet()
    size = int(cfg.TRAIN.IMAGE_SIZE[0])
    variables = model.init(rng, jnp.zeros((1, size, size, 3)))
    return model, variables, None


class TestCustomModelRegistry:
    def _cfg(self, name):
        from peft_vit_tpu.config import get_default_config

        cfg = get_default_config()
        cfg.MODEL.NAME = name
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.freeze()
        return cfg

    def test_registered_builder_owns_the_build(self):
        from peft_vit_tpu.models import build_image_classifier, register_model

        @register_model("tiny_custom_net")
        def build(cfg, spec, num_classes, rng):
            return _tiny_custom_builder(cfg, spec, num_classes, rng)

        cfg = self._cfg("tiny_custom_net")
        model, variables, enc = build_image_classifier(cfg, PEFTSpec(), 7)
        assert enc is None
        out = model.apply(variables, jnp.zeros((2, 16, 16, 3)))
        assert out.shape == (2, 7)

    def test_module_path_builder(self):
        from peft_vit_tpu.models import build_image_classifier

        cfg = self._cfg("test_models_extra:_tiny_custom_builder")
        model, variables, _ = build_image_classifier(cfg, PEFTSpec(), 3)
        out = model.apply(variables, jnp.zeros((2, 16, 16, 3)))
        assert out.shape == (2, 3)

    def test_builtin_names_fall_through(self):
        from peft_vit_tpu.models.registry import get_custom_builder

        assert get_custom_builder("clip_vitb16") is None
        assert get_custom_builder("cls_swin") is None


class TestSwinJittable:
    def test_shifted_window_model_jits(self):
        """Round-4 regression: _shift_attn_mask must stay pure numpy —
        jnp ops on the static mask became tracers under jit and made any
        jitted Swin train/eval step fail (caught by the bench matrix;
        eager applies never trace)."""
        import jax
        import jax.numpy as jnp

        from peft_vit_tpu.models import ImageClassifier
        from peft_vit_tpu.models.swin import SwinTransformer

        v = SwinTransformer(
            image_size=56, embed_dim=8, depths=(2, 2), num_heads=(2, 2),
            use_flash=False,
        )
        model = ImageClassifier(backbone=v, num_classes=5)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 56, 56, 3)), True
        )["params"]

        @jax.jit
        def step(p, x):
            return model.apply({"params": p}, x, True)

        out = step(params, jnp.zeros((2, 56, 56, 3)))
        assert out.shape == (2, 5)

"""ConvViT (cls_vit_conv / cls_vit_cswin coverage) and SSL-Swin / MoBY."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.models.vit_conv import ConvViT


def _x(b=2, s=16):
    return jnp.asarray(
        np.random.RandomState(0).rand(b, s, s, 3).astype(np.float32)
    )


class TestConvViT:
    def test_conv_branch_forward(self):
        m = ConvViT(
            image_size=16, patch_size=8, width=32, layers=2, heads=2,
            has_conv=True, add_cls=True, conv_ratio=2.0,
        )
        variables = m.init(jax.random.PRNGKey(0), _x())
        assert "batch_stats" in variables  # conv mixer BN
        out = m.apply(variables, _x(), True)
        assert out.shape == (2, 32)
        # train mode mutates BN stats
        out2, upd = m.apply(
            variables, _x(), False, mutable=["batch_stats"]
        )
        assert out2.shape == (2, 32)
        leaves = jax.tree_util.tree_leaves(upd["batch_stats"])
        assert any(
            not np.allclose(a, b)
            for a, b in zip(
                leaves,
                jax.tree_util.tree_leaves(variables["batch_stats"]),
            )
        )

    def test_cswin_variant_lepe_res_score(self):
        # the reference's "cswin" = LePE + res_score global ViT
        m = ConvViT(
            image_size=16, patch_size=8, width=32, layers=3, heads=2,
            lepe=True, res_score=True, has_conv=False,
        )
        variables = m.init(jax.random.PRNGKey(0), _x())
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        names = ["/".join(str(k) for k in p) for p, _ in flat]
        assert any("get_v" in n for n in names)  # LePE conv exists
        out = m.apply(variables, _x(), True)
        assert out.shape == (2, 32) and np.isfinite(np.asarray(out)).all()

    def test_res_score_changes_output(self):
        kw = dict(
            image_size=16, patch_size=8, width=32, layers=3, heads=2,
        )
        a = ConvViT(**kw, res_score=False)
        b = ConvViT(**kw, res_score=True)
        va = a.init(jax.random.PRNGKey(0), _x())
        out_a = a.apply(va, _x(), True)
        out_b = b.apply(va, _x(), True)  # same params, chained scores
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))

    def test_no_cls_token_mean_pool(self):
        m = ConvViT(
            image_size=16, patch_size=8, width=32, layers=2, heads=2,
            use_cls_token=False, norm_embed=True,
        )
        variables = m.init(jax.random.PRNGKey(0), _x())
        flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
        names = ["/".join(str(k) for k in p) for p, _ in flat]
        assert not any("cls_token" in n for n in names)
        out = m.apply(variables, _x(), True)
        assert out.shape == (2, 32)

    def test_factory_dispatch(self):
        from peft_vit_tpu.models.factory import (
            build_image_classifier,
            is_convvit_model,
            is_swin_model,
        )
        from peft_vit_tpu.peft import PEFTSpec

        cfg = get_default_config()
        cfg.MODEL.NAME = "cls_vit_cswin"
        assert is_convvit_model(cfg) and not is_swin_model(cfg)
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
        cfg.MODEL.SPEC.VISION.WIDTH = 32
        cfg.MODEL.SPEC.VISION.LAYERS = 2
        cfg.MODEL.SPEC.VISION.HEADS = 2
        model, variables, _ = build_image_classifier(cfg, PEFTSpec(), 4)
        out = model.apply(variables, _x(), False)
        assert out.shape == (2, 4)


class TestSSLSwin:
    def _swin(self, **kw):
        from peft_vit_tpu.models.swin import SwinTransformer

        return SwinTransformer(
            image_size=16, patch_size=4, embed_dim=16,
            depths=(1, 1), num_heads=(2, 2), window_size=2,
            use_flash=False, **kw,
        )

    def test_ape_and_no_patch_norm(self):
        m = self._swin(ape=True, patch_norm=False)
        v = m.init(jax.random.PRNGKey(0), _x())
        flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
        names = ["/".join(str(k) for k in p) for p, _ in flat]
        assert any("absolute_pos_embed" in n for n in names)
        assert not any("pos_norm" in n for n in names)
        assert m.apply(v, _x(), True).shape == (2, 32)

    def test_n_last_blocks_features(self):
        m = self._swin()
        v = m.init(jax.random.PRNGKey(0), _x())
        f1 = m.apply(v, _x(), True, 1)
        f2 = m.apply(v, _x(), True, 2)
        # last block: final dim 32; plus the stage-0 block: +16
        assert f1.shape == (2, 32)
        assert f2.shape == (2, 48)

    def test_multi_crop_forward(self):
        from peft_vit_tpu.models.ssl_swin import multi_crop_forward

        m = self._swin()
        v = m.init(jax.random.PRNGKey(0), _x())
        apply_fn = lambda p, x, det: m.apply(p, x, det)
        crops = [_x(2, 16), _x(3, 16)]  # same res -> one forward
        out = multi_crop_forward(apply_fn, v, crops)
        assert out.shape == (5, 32)

    def test_teacher_builder_zero_drop_path(self):
        from peft_vit_tpu.models.ssl_swin import build_ssl_swin

        cfg = get_default_config()
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 4
        cfg.MODEL.SPEC.VISION.DIM_EMBED = 16
        cfg.MODEL.SPEC.VISION.DEPTHS = [1, 1]
        cfg.MODEL.SPEC.VISION.NUM_HEADS = [2, 2]
        cfg.MODEL.SPEC.VISION.WINDOW_SIZE = 2
        cfg.MODEL.SPEC.VISION.DROP_PATH_RATE = 0.2
        student = build_ssl_swin(cfg, is_teacher=False)
        teacher = build_ssl_swin(cfg, is_teacher=True)
        assert student.drop_path_rate == 0.2
        assert teacher.drop_path_rate == 0.0


class TestMoby:
    def test_moby_trains(self):
        from peft_vit_tpu.engine.ssl import (
            MobyEncoder,
            init_moby_state,
            make_moby_train_step,
        )
        from peft_vit_tpu.models.swin import SwinTransformer

        bb = lambda: SwinTransformer(
            image_size=16, patch_size=4, embed_dim=16,
            depths=(1, 1), num_heads=(2, 2), window_size=2,
            use_flash=False,
        )
        online = MobyEncoder(
            backbone=bb(), proj_hidden=32, embed_dim=16,
            with_predictor=True,
        )
        target = MobyEncoder(
            backbone=bb(), proj_hidden=32, embed_dim=16,
            with_predictor=False,
        )
        tx = optax.adam(1e-3)
        state = init_moby_state(
            online, target, tx, jax.random.PRNGKey(0), _x(4),
            queue_len=32,
        )
        step = make_moby_train_step(
            online, target, tx, total_steps=20
        )
        rng = np.random.RandomState(0)
        base = rng.rand(4, 16, 16, 3).astype(np.float32)
        losses = []
        for i in range(8):
            x1 = jnp.asarray(base + 0.05 * rng.randn(*base.shape))
            x2 = jnp.asarray(base + 0.05 * rng.randn(*base.shape))
            state, loss = step(state, x1, x2)
            losses.append(float(loss))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8
        # queue advanced and holds normalized keys
        assert float(jnp.abs(state.queue1).sum()) > 0

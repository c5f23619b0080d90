"""Loss zoo + optimizer/schedule builder tests (lib/core/loss.py and
optim/build.py parity surfaces)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.engine.loss import (
    build_criterion,
    clip_contrastive_loss,
    focal_loss,
    multi_softmax_cross_entropy,
    sigmoid_multilabel_loss,
    soft_target_cross_entropy,
    softmax_cross_entropy,
)
from peft_vit_tpu.engine.optim import (
    build_lr_schedule,
    build_optimizer,
    larc,
    no_weight_decay_mask,
    step_decay_schedule,
    warmup_cosine_schedule,
)


class TestLosses:
    def test_ce_matches_manual(self):
        logits = jnp.asarray([[2.0, 0.0], [0.0, 2.0]])
        y = jnp.asarray([0, 1])
        expect = -np.log(np.exp(2) / (np.exp(2) + 1))
        np.testing.assert_allclose(
            float(softmax_cross_entropy(logits, y)), expect, rtol=1e-6
        )

    def test_label_smoothing_increases_loss_at_confident(self):
        logits = jnp.asarray([[10.0, -10.0]])
        y = jnp.asarray([0])
        l0 = float(softmax_cross_entropy(logits, y, 0.0))
        l1 = float(softmax_cross_entropy(logits, y, 0.1))
        assert l1 > l0

    def test_soft_target(self):
        logits = jnp.zeros((1, 4))
        t = jnp.asarray([[0.25, 0.25, 0.25, 0.25]])
        np.testing.assert_allclose(
            float(soft_target_cross_entropy(logits, t)),
            np.log(4),
            rtol=1e-6,
        )

    def test_sigmoid_multilabel(self):
        logits = jnp.asarray([[100.0, -100.0]])
        t = jnp.asarray([[1, 0]])
        assert float(sigmoid_multilabel_loss(logits, t)) < 1e-6

    def test_focal_downweights_easy(self):
        # focal is the reference's SIGMOID formulation (loss.py:31-60),
        # so the fair baseline is sigmoid BCE: the modulator must shrink
        # easy examples more than the underlying BCE already does
        easy = jnp.asarray([[5.0, -5.0]])
        hard = jnp.asarray([[0.1, -0.1]])
        y = jnp.asarray([0])
        ratio_focal = float(
            focal_loss(hard, y, normalize=False)
        ) / max(float(focal_loss(easy, y, normalize=False)), 1e-12)
        onehot = jnp.asarray([[1.0, 0.0]])
        ratio_bce = float(sigmoid_multilabel_loss(hard, onehot)) / max(
            float(sigmoid_multilabel_loss(easy, onehot)), 1e-12
        )
        assert ratio_focal > ratio_bce  # focal punishes hard examples more

    def test_multi_softmax_normalizes(self):
        logits = jnp.zeros((1, 4))
        t = jnp.asarray([[1, 1, 0, 0]])
        np.testing.assert_allclose(
            float(multi_softmax_cross_entropy(logits, t)),
            np.log(4),
            rtol=1e-6,
        )

    def test_builder_dispatch(self):
        cfg = get_default_config()
        for name in ("softmax", "sigmoid", "focal", "soft_target",
                     "multi_softmax"):
            cfg.LOSS.LOSS = name
            fn = build_criterion(cfg)
            v = fn(jnp.zeros((2, 3)), jnp.asarray([0, 1]) if name not in
                   ("sigmoid", "soft_target", "multi_softmax")
                   else jnp.zeros((2, 3)))
            assert np.isfinite(float(v))
        cfg.LOSS.LOSS = "nonsense"
        with pytest.raises(ValueError):
            build_criterion(cfg)


class TestSchedules:
    def test_step_decay(self):
        s = step_decay_schedule(1.0, [2, 4], steps_per_epoch=10)
        assert float(s(0)) == 1.0
        assert abs(float(s(25)) - 0.1) < 1e-6  # epoch 2
        assert abs(float(s(45)) - 0.01) < 1e-7  # epoch 4

    def test_warmup_cosine(self):
        s = warmup_cosine_schedule(
            1.0, total_steps=100, warmup_steps=10, warmup_factor=0.1
        )
        assert float(s(0)) == pytest.approx(0.1, rel=1e-3)
        # reference semantics: wf multiplies the from-zero cosine, so the
        # end of warmup reads 0.5*(1+cos(pi*10/100)) = 0.97553, not 1.0
        # (warmup_lr.py:78-84; pinned in test_refexec_engine.py)
        assert float(s(10)) == pytest.approx(0.97553, rel=1e-3)
        assert float(s(100)) == pytest.approx(0.0, abs=1e-6)

    def test_cyclic(self):
        from peft_vit_tpu.engine.optim import cyclic_schedule

        s = cyclic_schedule(0.1, 1.0, step_size_up=10)
        assert float(s(0)) == pytest.approx(0.1)
        assert float(s(10)) == pytest.approx(1.0)  # peak
        assert float(s(20)) == pytest.approx(0.1)  # trough
        assert float(s(25)) == pytest.approx(0.55)
        # triangular2 halves the amplitude per cycle
        s2 = cyclic_schedule(0.1, 1.0, 10, mode="triangular2")
        assert float(s2(30)) == pytest.approx(0.1 + 0.45)

    def test_build_from_config(self):
        cfg = get_default_config()
        for method in (
            "step", "cosine", "warmupcosine", "constant", "cyclic", "swalr"
        ):
            cfg.TRAIN.LR_SCHEDULER.METHOD = method
            s = build_lr_schedule(cfg, steps_per_epoch=10)
            assert np.isfinite(float(s(5)))


class TestOptimBuilder:
    def params(self):
        return {
            "classifier": {
                "head": {
                    "kernel": jnp.ones((4, 2)),
                    "bias": jnp.zeros(2),
                }
            },
            "backbone": {"blocks_0": {"ln_1": {"scale": jnp.ones(4)}}},
        }

    @pytest.mark.parametrize(
        "name", ["sgd", "adam", "adamW", "rmsprop"]
    )
    def test_variants_step(self, name):
        cfg = get_default_config()
        cfg.TRAIN.OPTIMIZER = name
        cfg.TRAIN.CLIP_GRAD_NORM = 1.0
        p = self.params()
        tx = build_optimizer(cfg, p, steps_per_epoch=1)
        state = tx.init(p)
        g = jax.tree_util.tree_map(jnp.ones_like, p)
        upd, _ = tx.update(g, state, p)
        p2 = optax.apply_updates(p, upd)
        leaf = p2["classifier"]["head"]["kernel"]
        assert np.isfinite(np.asarray(leaf)).all()
        assert not np.allclose(np.asarray(leaf), 1.0)

    def test_no_wd_mask_excludes_norm_bias(self):
        mask = no_weight_decay_mask(self.params())
        assert mask["classifier"]["head"]["kernel"] is True
        assert mask["classifier"]["head"]["bias"] is False
        assert mask["backbone"]["blocks_0"]["ln_1"]["scale"] is False

    def test_larc_clips_trust_ratio(self):
        tx = larc(trust_coefficient=0.01, learning_rate=1.0)
        p = {"w": jnp.ones(4) * 10.0}
        g = {"w": jnp.ones(4)}
        state = tx.init(p)
        upd, _ = tx.update(g, state, p)
        # adaptive = 0.01 * ||p|| / ||g|| = 0.01*20/2 = 0.1 < 1 -> scaled
        np.testing.assert_allclose(
            np.asarray(upd["w"]), 0.1 * np.ones(4), rtol=1e-5
        )

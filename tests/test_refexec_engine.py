"""Engine parity pinned against the EXECUTED reference.

tests/golden/refexec_engine.npz was produced by running the reference's
own schedule / LARC / EMA / loss / mixup / optimizer-grouping / sweep
code (tests/golden/generate_engine_from_reference.py).  These tests
replay the identical seeded inputs through peft_vit_tpu and compare.

The sweep tests are the protocol flagship: the reference's
hyperparameter_sweep ran with a stubbed train_task, so the fixture's
call trace and winner are the reference's own CONTROL FLOW.  They also
pin the documented deviation: the reference's refinement loop trains
every probe at the LEFT candidate's wd (adapter_tuning_clip.py:205), so
with a score peak between coarse points it settles on index 40 where
clean refinement (ours) reaches the true argmax at 43 — both outcomes
are asserted.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
sys.path.insert(0, GOLDEN)
from generate_engine_from_reference import (  # noqa: E402
    ema_inputs,
    larc_inputs,
    loss_inputs,
    mixup_inputs,
    score_fn_a,
    score_fn_b,
    score_fn_lr,
)

import generate_engine_from_reference as _genref  # noqa: E402

sys.path.pop(0)

G = np.load(os.path.join(GOLDEN, "refexec_engine.npz"))
GRID = np.logspace(-6, 6, num=97)


def _nearest(wd):
    return int(np.abs(GRID - wd).argmin())


class TestSchedulesRefexec:
    def test_warmup_cosine(self):
        from peft_vit_tpu.engine.optim import warmup_cosine_schedule

        s = warmup_cosine_schedule(
            0.1, total_steps=60, warmup_steps=10, warmup_factor=0.001
        )
        ours = np.asarray([float(s(t)) for t in range(60)])
        # atol: fp32 schedule vs torch's fp64 near the cosine zero
        np.testing.assert_allclose(
            ours, G["wc_lrs"], rtol=1e-5, atol=1e-8
        )

    def test_multistep(self):
        from peft_vit_tpu.engine.optim import step_decay_schedule

        s = step_decay_schedule(0.1, [3, 6], steps_per_epoch=1)
        ours = np.asarray([float(s(t)) for t in range(10)])
        np.testing.assert_allclose(ours, G["ms_lrs"], rtol=1e-6)

    @pytest.mark.parametrize(
        "key,mode,gamma",
        [
            ("cyc_tri", "triangular", 1.0),
            ("cyc_tri2", "triangular2", 1.0),
            ("cyc_exp", "exp_range", 0.98),
        ],
    )
    def test_cyclic(self, key, mode, gamma):
        from peft_vit_tpu.engine.optim import cyclic_schedule

        s = cyclic_schedule(
            1e-4, 1e-2, step_size_up=8, mode=mode, gamma=gamma
        )
        ours = np.asarray([float(s(t)) for t in range(40)])
        np.testing.assert_allclose(ours, G[key], rtol=1e-4, atol=1e-9)

    def test_swalr(self):
        from peft_vit_tpu.engine.ema import swalr_schedule

        s = swalr_schedule(0.1, 0.05, begin_step=0, anneal_steps=5,
                           strategy="cos")
        ours = np.asarray([float(s(t)) for t in range(10)])
        np.testing.assert_allclose(ours, G["swalr_lrs"], rtol=1e-5)

    def test_fewshot_step_decay(self):
        from peft_vit_tpu.engine.optim import step_decay_schedule

        s = step_decay_schedule(1e-3, [3, 6], steps_per_epoch=1)
        ours = np.asarray([float(s(t)) for t in range(10)])
        np.testing.assert_allclose(ours, G["stepdecay_lrs"], rtol=1e-6)


class TestLarcRefexec:
    @pytest.mark.parametrize("wd,tag", [(0.0, "wd0"), (0.01, "wd1")])
    def test_larc_sgd_momentum(self, wd, tag):
        from peft_vit_tpu.engine.optim import larc

        params, grads = larc_inputs()
        tree = [jnp.asarray(p.numpy()) for p in params]
        tx = optax.chain(
            larc(trust_coefficient=0.02, clip=True, learning_rate=0.1,
                 weight_decay=wd),
            optax.trace(decay=0.9),
            optax.scale(-0.1),
        )
        state = tx.init(tree)
        for step_grads in grads:
            g = [jnp.asarray(x.numpy()) for x in step_grads]
            updates, state = tx.update(g, state, tree)
            tree = optax.apply_updates(tree, updates)
        for i, p in enumerate(tree):
            np.testing.assert_allclose(
                np.asarray(p), G[f"larc_{tag}_p{i}"], rtol=1e-5, atol=1e-6
            )


class TestEmaRefexec:
    def test_ema_blend(self):
        from peft_vit_tpu.engine.ema import ema_init, ema_update

        init, steps = ema_inputs()
        state = ema_init([jnp.asarray(p.numpy()) for p in init], 0.9)
        for sa, sb in steps:
            state = ema_update(
                state, [jnp.asarray(sa.numpy()), jnp.asarray(sb.numpy())]
            )
        np.testing.assert_allclose(
            np.asarray(state.shadow[0]), G["ema_shadow_a"], rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(state.shadow[1]), G["ema_shadow_b"], rtol=1e-6
        )


class TestLossesRefexec:
    def setup_method(self, _):
        logits, labels, soft, multihot = loss_inputs()
        self.logits = jnp.asarray(logits.numpy())
        self.labels = jnp.asarray(labels.numpy())
        self.soft = jnp.asarray(soft.numpy())
        self.multihot = jnp.asarray(multihot.numpy())

    def test_label_smoothing(self):
        from peft_vit_tpu.engine.loss import softmax_cross_entropy

        ours = float(softmax_cross_entropy(self.logits, self.labels, 0.1))
        assert ours == pytest.approx(float(G["loss_ls"]), rel=1e-5)

    def test_soft_target(self):
        from peft_vit_tpu.engine.loss import soft_target_cross_entropy

        ours = float(soft_target_cross_entropy(self.logits, self.soft))
        assert ours == pytest.approx(float(G["loss_soft"]), rel=1e-5)

    @pytest.mark.parametrize(
        "normalize,key", [(True, "loss_focal"), (False, "loss_focal_nonorm")]
    )
    def test_focal(self, normalize, key):
        from peft_vit_tpu.engine.loss import focal_loss

        ours = float(
            focal_loss(self.logits, self.multihot, alpha=0.7, gamma=0.5,
                       normalize=normalize)
        )
        assert ours == pytest.approx(float(G[key]), rel=1e-5)

    def test_multi_softmax(self):
        from peft_vit_tpu.engine.loss import multi_softmax_cross_entropy

        ours = float(
            multi_softmax_cross_entropy(self.logits, self.multihot)
        )
        assert ours == pytest.approx(float(G["loss_msce"]), rel=1e-5)

    def test_multilabel_soft_margin(self):
        from peft_vit_tpu.engine.loss import multilabel_soft_margin_loss

        ours = float(
            multilabel_soft_margin_loss(self.logits, self.multihot)
        )
        assert ours == pytest.approx(float(G["loss_mlsm"]), rel=1e-5)

    def test_clip_contrastive(self):
        from peft_vit_tpu.engine.loss import clip_contrastive_loss

        x = self.logits[:, :4]
        ours = float(clip_contrastive_loss(x, x.T))
        assert ours == pytest.approx(float(G["loss_clip"]), rel=1e-5)


class TestMixupRefexec:
    """Semantic pins: the reference mixes with a random permutation
    partner where our jittable mixup uses roll (documented TPU-native
    choice) — so these verify the MIXING FORMULAS against the executed
    reference with its own lam/partner, not our RNG plumbing."""

    def test_mixup_formula(self):
        import torch

        x, y = mixup_inputs()
        x = x.numpy()
        np.random.seed(7)
        lam = float(np.random.beta(0.8, 0.8))
        assert lam == pytest.approx(float(G["mix_lam"]), rel=1e-9)
        torch.manual_seed(7)
        perm = torch.randperm(x.shape[0]).numpy()
        np.testing.assert_array_equal(y.numpy()[perm], G["mix_yb"])
        mixed = lam * x + (1 - lam) * x[perm]  # = our engine.mixup blend
        np.testing.assert_allclose(mixed, G["mix_x"], rtol=1e-6)

    def test_cutmix_formula(self):
        import torch

        x, y = mixup_inputs()
        x = x.numpy()
        b, c, h, w = x.shape
        np.random.seed(9)
        lam0 = float(np.random.beta(1.0, 1.0))
        cut_rat = np.sqrt(1.0 - lam0)
        cut_w, cut_h = int(w * cut_rat), int(h * cut_rat)
        cx, cy = np.random.randint(w), np.random.randint(h)
        bbx1 = np.clip(cx - cut_w // 2, 0, w)
        bby1 = np.clip(cy - cut_h // 2, 0, h)
        bbx2 = np.clip(cx + cut_w // 2, 0, w)
        bby2 = np.clip(cy + cut_h // 2, 0, h)
        torch.manual_seed(9)
        perm = torch.randperm(b).numpy()
        np.testing.assert_array_equal(y.numpy()[perm], G["cut_yb"])
        cut = x.copy()
        cut[:, :, bbx1:bbx2, bby1:bby2] = x[perm][:, :, bbx1:bbx2,
                                                  bby1:bby2]
        np.testing.assert_allclose(cut, G["cut_x"], rtol=1e-6)
        # lam adjusted to the exact pixel ratio — same formula our
        # engine.mixup.cutmix applies (lam_adj = 1 - area / (h*w))
        lam_adj = 1 - (bbx2 - bbx1) * (bby2 - bby1) / (h * w)
        assert lam_adj == pytest.approx(float(G["cut_lam"]), rel=1e-9)


class TestWdGroupsRefexec:
    # torch parameter name -> the analogous flax param path
    MAPPING = {
        "conv.weight": "conv/kernel",
        "conv.bias": "conv/bias",
        "dw.weight": "dw/kernel",
        "dw.bias": "dw/bias",
        "bn.weight": "bn/scale",
        "bn.bias": "bn/bias",
        "ln.weight": "ln_x/scale",
        "ln.bias": "ln_x/bias",
        "gn.weight": "gn/scale",
        "gn.bias": "gn/bias",
        "fc.weight": "fc/kernel",
        "fc.bias": "fc/bias",
        "tok": "tok",
    }

    def test_no_weight_decay_groups(self):
        from peft_vit_tpu.engine.optim import no_weight_decay_mask

        params = {
            "conv": {"kernel": jnp.zeros((3, 3, 4, 8)),
                     "bias": jnp.zeros(8)},
            # depthwise: HWIO with in_features/groups == 1
            "dw": {"kernel": jnp.zeros((3, 3, 1, 8)),
                   "bias": jnp.zeros(8)},
            "bn": {"scale": jnp.zeros(8), "bias": jnp.zeros(8)},
            "ln_x": {"scale": jnp.zeros(8), "bias": jnp.zeros(8)},
            "gn": {"scale": jnp.zeros(8), "bias": jnp.zeros(8)},
            "fc": {"kernel": jnp.zeros((8, 2)), "bias": jnp.zeros(2)},
            "tok": jnp.zeros(8),
        }
        # WITHOUT_WD_LIST as the reference config ships it, plus the
        # model-declared no_weight_decay() name (set_wd's `skip`)
        mask = no_weight_decay_mask(
            params, ["bn", "gn", "ln", "bias", "depthwise", "tok"]
        )
        from flax import traverse_util

        flat = traverse_util.flatten_dict(mask, sep="/")
        ours_no_wd = {k for k, v in flat.items() if v is False}
        ref = json.loads(str(G["wd_groups_json"]))
        ref_no_wd = {self.MAPPING[n] for n in ref["no_wd"]}
        ref_with_wd = {self.MAPPING[n] for n in ref["with_wd"]}
        assert ours_no_wd == ref_no_wd
        assert {k for k, v in flat.items() if v is True} == ref_with_wd


class TestSweepRefexec:
    """The reference's hyperparameter_sweep control flow, executed with a
    stubbed train_task, vs our SweepEngine.sweep_wd with an equally
    stubbed train_cells."""

    def _engine(self, score):
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.engine.sweep import SweepEngine

        cfg = get_default_config()
        eng = SweepEngine(
            cfg,
            apply_fn=lambda v, x, train: x,
            init_trainable=lambda rng: {"w": jnp.zeros(1)},
            frozen={},
            criterion=lambda logits, y: jnp.zeros(logits.shape[0]),
            batch_size=8,
        )
        calls = []

        def train_cells(lrs, wds, task, end_epoch, **kw):
            out = []
            for lr, wd in zip(lrs, wds):
                calls.append(float(wd))
                out.append(score(float(lr), _nearest(wd)))
            return np.asarray(out)

        eng.train_cells = train_cells
        return eng, calls

    def test_coarse_grid_matches_reference(self):
        eng, calls = self._engine(lambda lr, i: score_fn_a(i))
        eng.sweep_wd(1e-3, task=None, end_epoch=5)
        # the reference's first 7 trained wds are its float-equality
        # coarse selection (adapter_tuning_clip.py:176-178); our
        # index-based selection must visit the same cells in order
        np.testing.assert_allclose(
            calls[:7], G["sweep_a_calls"][:7], rtol=1e-12
        )

    def test_peak_at_coarse_point_agrees(self):
        eng, _ = self._engine(lambda lr, i: score_fn_a(i))
        best_wd, best_score = eng.sweep_wd(1e-3, task=None, end_epoch=5)
        assert best_wd == pytest.approx(
            float(G["sweep_a_best_wd"]), rel=1e-12
        )
        assert best_score == pytest.approx(float(G["sweep_a_best_score"]))

    def test_left_wd_bug_documented_divergence(self):
        # reference: refinement trains the RIGHT probe at the LEFT wd
        # (adapter_tuning_clip.py:205) and the executed fixture proves it
        # lands on index 40 (score 97) for a peak at 43
        assert _nearest(float(G["sweep_b_best_wd"])) == 40
        assert float(G["sweep_b_best_score"]) == pytest.approx(97.0)
        # the reference trace shows the bug in the raw calls: every
        # refinement round trains the left wd twice
        calls_ref = G["sweep_b_calls"]
        assert len(calls_ref) == 15
        refine = calls_ref[7:]
        assert refine[0] == refine[1]  # left trained for both probes
        # ours (clean refinement, documented deviation) reaches the peak
        eng, _ = self._engine(lambda lr, i: score_fn_b(i))
        best_wd, best_score = eng.sweep_wd(1e-3, task=None, end_epoch=5)
        assert _nearest(best_wd) == 43
        assert best_score == pytest.approx(100.0)

    def test_ref_compat_reproduces_executed_reference(self):
        """SWEEP.REF_COMPAT=True (VERDICT r3 #8): our sweep replays the
        reference's refinement — left-wd training for both probes, no
        cell cache — and lands on the executed fixture's EXACT winner
        (idx 40, score 97) with the identical trained-wd call sequence."""
        eng, calls = self._engine(lambda lr, i: score_fn_b(i))
        eng.cfg.SWEEP.REF_COMPAT = True
        best_wd, best_score = eng.sweep_wd(1e-3, task=None, end_epoch=5)
        assert _nearest(best_wd) == _nearest(float(G["sweep_b_best_wd"]))
        assert best_score == pytest.approx(float(G["sweep_b_best_score"]))
        np.testing.assert_allclose(
            calls, G["sweep_b_calls"], rtol=1e-12
        )

    def test_full_lr_wd_search(self):
        eng, _ = self._engine(score_fn_lr)
        best_lr, best_wd, _ = eng.sweep(task=None, end_epoch=5)
        assert best_lr == pytest.approx(float(G["sweep_lr_best_lr"]))
        # same winning lr as the executed reference; wd differs only by
        # the left-wd refinement bug (43 clean vs 40 reference)
        assert _nearest(best_wd) == 43
        assert _nearest(float(G["sweep_lr_best_wd"])) == 40


class TestContrastiveRefexec:
    def test_hybrid_contrastive(self):
        contrastive_inputs = _genref.contrastive_inputs
        from peft_vit_tpu.engine.loss import hybrid_contrastive_loss

        img, txt, labels = contrastive_inputs()
        ours = float(
            hybrid_contrastive_loss(
                jnp.asarray(img.numpy()),
                jnp.asarray(txt.numpy()),
                jnp.asarray(labels.numpy()),
                jnp.asarray(float(G["hybrid_logit_scale"])),
            )
        )
        assert ours == pytest.approx(float(G["hybrid_loss"]), rel=1e-5)


class TestBnProbeRefexec:
    def test_bn_probe_train_eval_cycle(self):
        """linear_classifier.py Classifier executed: 3 train-mode
        forwards (batch stats + torch's momentum-0.1 running update with
        UNBIASED batch variance) then an eval forward on the running
        stats — the probe BN semantics the sweep trains/validates with."""
        bn_probe_inputs = _genref.bn_probe_inputs
        from peft_vit_tpu.models.classifier import ClassifierHead

        feats_train, feats_eval, w, bias = bn_probe_inputs()
        head = ClassifierHead(num_classes=w.shape[0], use_bn=True)
        x0 = jnp.asarray(feats_train[0].numpy())
        variables = head.init(jax.random.PRNGKey(0), x0)
        from flax import traverse_util

        pf = traverse_util.flatten_dict(variables["params"], sep="/")
        pf["head/kernel"] = jnp.asarray(w.numpy().T)
        pf["head/bias"] = jnp.asarray(bias.numpy())
        params = traverse_util.unflatten_dict(pf, sep="/")
        stats = variables["batch_stats"]
        for i, f in enumerate(feats_train):
            out, upd = head.apply(
                {"params": params, "batch_stats": stats},
                jnp.asarray(f.numpy()),
                train=True,
                mutable=["batch_stats"],
            )
            np.testing.assert_allclose(
                np.asarray(out), G[f"bn_probe_train{i}"],
                rtol=1e-4, atol=1e-5,
            )
            stats = upd["batch_stats"]
        sf = traverse_util.flatten_dict(stats, sep="/")
        np.testing.assert_allclose(
            np.asarray(sf["channel_bn/bn_mean"]),
            G["bn_probe_running_mean"], rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(sf["channel_bn/bn_var"]),
            G["bn_probe_running_var"], rtol=1e-4, atol=1e-6,
        )
        out_eval = head.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(feats_eval.numpy()),
            train=False,
        )
        np.testing.assert_allclose(
            np.asarray(out_eval), G["bn_probe_eval"],
            rtol=1e-4, atol=1e-5,
        )


class TestTokenizerRefexec:
    def test_clip_bpe_ids(self):
        TOKENIZER_SAMPLES = _genref.TOKENIZER_SAMPLES
        from peft_vit_tpu.data.tokenizer import get_tokenizer

        tok = get_tokenizer()
        ids = tok.tokenize(TOKENIZER_SAMPLES, context_length=77)
        np.testing.assert_array_equal(
            np.asarray(ids), G["tokenizer_ids"]
        )


class TestIntrinsicRefexec:
    def test_wht(self):
        intrinsic_inputs = _genref.intrinsic_inputs
        from peft_vit_tpu.peft.intrinsic import _wht_unnorm

        _, x16 = intrinsic_inputs()
        ours = np.asarray(_wht_unnorm(jnp.asarray(x16.numpy())))
        np.testing.assert_allclose(ours, G["wht_out"], rtol=1e-5)

    def test_fastfood_transform(self):
        intrinsic_inputs = _genref.intrinsic_inputs
        from peft_vit_tpu.peft.intrinsic import (
            LeafProjection,
            fastfood_transform,
        )

        v, _ = intrinsic_inputs()
        leaf = LeafProjection(
            b=jnp.asarray(G["ff_b"]),
            pi=jnp.asarray(G["ff_pi"]),
            g=jnp.asarray(G["ff_g"]),
            divisor=jnp.asarray(float(G["ff_divisor"])),
            dd=11,
            ll=int(G["ff_ll"]),
            shape=(11,),
        )
        ours = np.asarray(
            fastfood_transform(jnp.asarray(v.numpy()), leaf)
        )
        np.testing.assert_allclose(
            ours, G["ff_ret"], rtol=1e-5, atol=1e-6
        )

    def test_dense_ray(self):
        P = G["dense_p"].reshape(-1, 6)  # (dd, d) flat, as ours stores it
        v = G["dense_v"].reshape(-1)
        ours = (P @ v).reshape(3, 4)  # materialize()'s dense branch math
        np.testing.assert_allclose(
            ours, G["dense_ray"], rtol=1e-5, atol=1e-6
        )

"""QLoRA-style int8-forward / full-precision-backward training
(TPU.INT8_FWD_TRAIN; VERDICT r3 next-round #1).

The frozen tower's dense GEMMs run through the int8 MXU path on the
TRAINING forward, with a custom-vjp backward that uses the original
bf16/fp32 weights and activations (ops/int8.py int8_matmul_bf16_bwd) —
exactly QLoRA's recipe (quantized base weights, full-precision
adapter gradients).  Acceptance here (the offline convergence gate):

* op level: the quantized forward matches int8_matmul bit-for-bit and
  the backward matches the DENSE matmul's dx/dw exactly;
* model level: LoRA gradients under the quantized forward stay within
  cosine 0.99 of the dense-path gradients;
* convergence: a synthetic few-shot task trained both ways reaches the
  same predictions and a loss trajectory within tolerance.

The throughput claim is measured on the real chip (BASELINE.md round 4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.ops.int8 import int8_matmul, int8_matmul_bf16_bwd
from peft_vit_tpu.peft import PEFTSpec, build_mask, merge_params, split_params


def cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestOp:
    def test_forward_matches_int8_matmul(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 7, 32).astype(np.float32))
        w = jnp.asarray(rng.randn(32, 16).astype(np.float32) * 0.05)
        np.testing.assert_array_equal(
            np.asarray(int8_matmul_bf16_bwd(x, w)),
            np.asarray(int8_matmul(x, w)),
        )

    def test_backward_is_dense(self):
        """dx and dw equal the DENSE matmul's cotangents (the bf16-weight
        backward), not the quantized function's (which would be ~zero
        through jnp.round)."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(5, 12).astype(np.float32))
        w = jnp.asarray(rng.randn(12, 8).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.randn(5, 8).astype(np.float32))

        _, vjp = jax.vjp(int8_matmul_bf16_bwd, x, w)
        dx, dw = vjp(g)
        _, dense_vjp = jax.vjp(lambda x, w: x @ w, x, w)
        dx_d, dw_d = dense_vjp(g)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_d), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_d), rtol=1e-6)

    def test_i8bwd_variant(self):
        """SwitchBack variant (TPU.INT8_BWD_DX): forward identical to the
        prequant op; dx runs the int8 path against the pre-quantized
        TRANSPOSED kernel (cosine ~1 to the dense dx); dw stays exact."""
        from peft_vit_tpu.ops.int8 import (
            int8_prequant_matmul,
            int8_prequant_matmul_i8bwd,
            quantize_cols,
        )

        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(6, 32).astype(np.float32))
        w = jnp.asarray(rng.randn(32, 16).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.randn(6, 16).astype(np.float32))
        w_i8, s_w = quantize_cols(w)
        wt_i8, s_wt = quantize_cols(w.T)

        y2, vjp2 = jax.vjp(
            int8_prequant_matmul_i8bwd, x, w, w_i8, s_w, wt_i8, s_wt
        )
        y1 = int8_prequant_matmul(x, w, w_i8, s_w)
        np.testing.assert_array_equal(np.asarray(y2), np.asarray(y1))

        dx, dw = vjp2(g)[:2]
        dx_dense = np.asarray(g) @ np.asarray(w).T
        assert cos(dx, dx_dense) > 0.999, cos(dx, dx_dense)
        np.testing.assert_allclose(
            np.asarray(dw), np.asarray(x).T @ np.asarray(g), rtol=1e-6
        )

    def test_grad_flows_batched(self):
        x = jnp.ones((2, 3, 4))
        w = jnp.full((4, 6), 0.25)
        dx = jax.grad(lambda x: jnp.sum(int8_matmul_bf16_bwd(x, w)))(x)
        assert np.isfinite(np.asarray(dx)).all()
        # sum over output axis of w rows
        np.testing.assert_allclose(np.asarray(dx), 6 * 0.25, rtol=1e-6)

    def test_static_variant(self):
        """TPU.INT8_STATIC_ACT op: per-tensor static activation scale —
        saturating elementwise quantize, dense-exact backward, and a
        well-calibrated scale tracks the dense product closely."""
        from peft_vit_tpu.ops.int8 import (
            int8_static_matmul,
            quantize_cols,
            quantize_static,
        )

        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(6, 32).astype(np.float32))
        w = jnp.asarray(rng.randn(32, 16).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.randn(6, 16).astype(np.float32))
        w_i8, s_w = quantize_cols(w)
        s_x = jnp.max(jnp.abs(x)) / 127.0

        y, vjp = jax.vjp(int8_static_matmul, x, w, w_i8, s_w, s_x)
        # forward == the explicit static-quantize contraction
        want = (
            quantize_static(x, s_x).astype(np.int32)
            @ np.asarray(w_i8, np.int32)
        ).astype(np.float32) * float(s_x) * np.asarray(s_w)
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6)
        assert cos(y, np.asarray(x) @ np.asarray(w)) > 0.999
        # backward: dense-exact dx/dw (float32 accumulation vs numpy
        # float64 reference -> 1e-5)
        dx, dw = vjp(g)[:2]
        np.testing.assert_allclose(
            np.asarray(dx), np.asarray(g) @ np.asarray(w).T,
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(dw), np.asarray(x).T @ np.asarray(g),
            rtol=1e-5, atol=1e-6,
        )
        # saturation: values beyond the calibrated range clip to +-127
        big = x.at[0, 0].set(1e6)
        q = np.asarray(quantize_static(big, s_x))
        assert q[0, 0] == 127
        assert np.abs(q).max() <= 127


def _model(int8_train, num_classes=5):
    vit = VisionTransformer(
        image_size=16,
        patch_size=8,
        width=64,
        layers=2,
        heads=2,
        style="clip",
        output_dim=32,
        spec=PEFTSpec(
            method="lora",
            attn_delta="lora",
            lora_rank=4,
            lora_alpha=128.0,
            lora_post_scale_q=True,
        ),
        use_flash=False,
        int8_train=int8_train,
    )
    return ImageClassifier(backbone=vit, num_classes=num_classes)


def _loss_fn(model):
    def f(trainable, frozen, x, y):
        p = merge_params(trainable, frozen)
        logits = model.apply({"params": p}, x, True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(lp, y[:, None], axis=-1))

    return f


class TestModel:
    def _setup(self):
        x0 = jnp.zeros((1, 16, 16, 3))
        params = _model(False).init(jax.random.PRNGKey(0), x0)["params"]
        mask = build_mask(params, "lora", num_layers=2)
        trainable, frozen = split_params(params, mask)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(8, 16, 16, 3), jnp.float32)
        y = jnp.asarray(rng.randint(0, 5, 8))
        return trainable, frozen, x, y

    def test_lora_grads_close_to_dense(self):
        trainable, frozen, x, y = self._setup()
        l_fp, g_fp = jax.value_and_grad(_loss_fn(_model(False)))(
            trainable, frozen, x, y
        )
        l_q, g_q = jax.value_and_grad(_loss_fn(_model(True)))(
            trainable, frozen, x, y
        )
        assert abs(float(l_fp) - float(l_q)) < 0.05 * abs(float(l_fp)) + 1e-3
        flat_fp = jax.tree_util.tree_leaves_with_path(g_fp)
        flat_q = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_q)
        )
        checked = 0
        for k, v in flat_fp:
            ks = jax.tree_util.keystr(k)
            a = np.asarray(v)
            if np.linalg.norm(a) < 1e-9:  # zero-init B matrices step 0
                continue
            assert cos(a, flat_q[ks]) > 0.99, (ks, cos(a, flat_q[ks]))
            checked += 1
        assert checked >= 2

    def test_convergence_parity(self):
        """Train 40 SGD steps both ways on a separable synthetic task:
        same final accuracy, near-identical predictions, and a loss
        trajectory within tolerance.

        NB this 64-wide tower with RANDOM frozen weights is the
        quantization worst case (per-token absmax over 64 lanes; the real
        768-wide pretrained tower quantizes far tighter — feature cosine
        0.999769 measured on chip, BASELINE.md round 3), so tolerances
        here are looser than the flagship gate in BASELINE.md round 4."""
        from peft_vit_tpu.engine import init_cell_state, sgd_update

        trainable, frozen, _, _ = self._setup()
        # separable task: class-colored blobs
        rng = np.random.RandomState(2)
        y_np = np.tile(np.arange(5), 4)
        x = rng.randn(20, 16, 16, 3).astype(np.float32) * 0.3
        x += np.linspace(-1, 1, 5)[y_np][:, None, None, None]
        x, y = jnp.asarray(x), jnp.asarray(y_np)

        def train(int8):
            model = _model(int8)
            grad_fn = jax.value_and_grad(_loss_fn(model))

            @jax.jit
            def step(state):
                loss, grads = grad_fn(state.trainable, frozen, x, y)
                return sgd_update(grads, state, 3e-3, 1e-4), loss

            state = init_cell_state(jax.tree.map(jnp.copy, trainable))
            losses = []
            for _ in range(40):
                state, loss = step(state)
                losses.append(float(loss))
            logits = model.apply(
                {"params": merge_params(state.trainable, frozen)}, x, False
            )
            return np.asarray(losses), np.argmax(np.asarray(logits), -1)

        losses_fp, pred_fp = train(False)
        losses_q, pred_q = train(True)
        assert np.isfinite(losses_q).all()
        # same learning dynamics
        np.testing.assert_allclose(losses_q, losses_fp, rtol=0.25, atol=0.02)
        # same final behavior: accuracy equal within one sample
        acc_fp = (pred_fp == y_np).mean()
        acc_q = (pred_q == y_np).mean()
        assert abs(acc_fp - acc_q) <= 0.05, (acc_fp, acc_q)
        assert (pred_fp == pred_q).mean() >= 0.85
        assert losses_q[-1] < losses_q[0] * 0.5  # it actually learns
        assert losses_fp[-1] < losses_fp[0] * 0.5

    def _apply_variants(self):
        """(name, loss_and_grad callable) for dense / int8-fwd /
        int8-fwd+int8-dx, the latter two through the PRE-QUANTIZED
        per-dispatch path the Trainer and bench use (quantize_frozen_tree
        outside the step; Int8Dense picks the dx backward iff wt_i8 is
        present)."""
        from peft_vit_tpu.ops.int8 import quantize_frozen_tree

        def dense(trainable, frozen, x, y):
            return jax.value_and_grad(_loss_fn(_model(False)))(
                trainable, frozen, x, y
            )

        def prequant(bwd_dx):
            model = _model(True)

            def f(trainable, frozen, x, y):
                qk = quantize_frozen_tree(frozen, bwd_dx=bwd_dx)

                def loss(tr):
                    p = merge_params(tr, frozen)
                    logits = model.apply(
                        {"params": p, "qkernel": qk}, x, True
                    )
                    lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                    return -jnp.mean(
                        jnp.take_along_axis(lp, y[:, None], axis=-1)
                    )

                return jax.value_and_grad(loss)(trainable)

            return f

        return [
            ("dense", dense),
            ("int8_fwd", prequant(False)),
            ("int8_fwd_dx", prequant(True)),
        ]

    def test_dx_lora_grads_close_to_dense(self):
        """TPU.INT8_BWD_DX model-level gate: LoRA gradients under the
        int8-dx backward stay within cosine 0.98 of the dense path (the
        dx GEMM itself is int8 vs the fwd-only path's exact bf16 dx, so
        the tolerance is one notch looser than the 0.99 fwd-only gate)."""
        trainable, frozen, x, y = self._setup()
        variants = dict(self._apply_variants())
        l_fp, g_fp = variants["dense"](trainable, frozen, x, y)
        l_dx, g_dx = variants["int8_fwd_dx"](trainable, frozen, x, y)
        assert abs(float(l_fp) - float(l_dx)) < 0.05 * abs(float(l_fp)) + 1e-3
        flat_dx = dict(
            (jax.tree_util.keystr(k), v)
            for k, v in jax.tree_util.tree_leaves_with_path(g_dx)
        )
        checked = 0
        for k, v in jax.tree_util.tree_leaves_with_path(g_fp):
            ks = jax.tree_util.keystr(k)
            a = np.asarray(v)
            if np.linalg.norm(a) < 1e-9:
                continue
            assert cos(a, flat_dx[ks]) > 0.98, (ks, cos(a, flat_dx[ks]))
            checked += 1
        assert checked >= 2

    def test_dx_convergence_parity(self):
        """The dx variant's 40-step trajectory tracks dense within the
        same tolerances as the fwd-only gate, on the same worst-case
        random-weight tiny tower."""
        from peft_vit_tpu.engine import init_cell_state, sgd_update

        trainable, frozen, _, _ = self._setup()
        rng = np.random.RandomState(2)
        y_np = np.tile(np.arange(5), 4)
        x = rng.randn(20, 16, 16, 3).astype(np.float32) * 0.3
        x += np.linspace(-1, 1, 5)[y_np][:, None, None, None]
        x, y = jnp.asarray(x), jnp.asarray(y_np)
        variants = dict(self._apply_variants())

        def train(name):
            grad_fn = variants[name]

            @jax.jit
            def step(state):
                loss, grads = grad_fn(state.trainable, frozen, x, y)
                return sgd_update(grads, state, 3e-3, 1e-4), loss

            state = init_cell_state(jax.tree.map(jnp.copy, trainable))
            losses = []
            for _ in range(40):
                state, loss = step(state)
                losses.append(float(loss))
            model = _model(name != "dense")
            logits = model.apply(
                {"params": merge_params(state.trainable, frozen)}, x, False
            )
            return np.asarray(losses), np.argmax(np.asarray(logits), -1)

        losses_fp, pred_fp = train("dense")
        losses_dx, pred_dx = train("int8_fwd_dx")
        assert np.isfinite(losses_dx).all()
        np.testing.assert_allclose(losses_dx, losses_fp, rtol=0.25, atol=0.02)
        acc_fp = (pred_fp == y_np).mean()
        acc_dx = (pred_dx == y_np).mean()
        assert abs(acc_fp - acc_dx) <= 0.05, (acc_fp, acc_dx)
        assert (pred_fp == pred_dx).mean() >= 0.85
        assert losses_dx[-1] < losses_dx[0] * 0.5

    def test_factory_flag(self):
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import spec_from_config

        cfg = get_default_config()
        cfg.TPU.INT8_FWD_TRAIN = True
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
        assert model.backbone.int8_train is True
        x = jnp.zeros((2, 16, 16, 3))
        out = model.apply({"params": variables["params"]}, x, True)
        assert np.isfinite(np.asarray(out)).all()


class TestTrainerPerRunPrequant:
    """The production Trainer quantizes the frozen tower ONCE PER RUN
    (engine/trainer.py _frozen_qk) — the k->infinity limit of dispatch
    -level amortization, since the tower never changes.  Gate (VERDICT
    r4 #2 rebuild): on a SEPARABLE task (the class-brightness blobs the
    convergence-parity gate above uses — the old band task was pairwise
    inseparable through the 8x8-patch frozen random embed, so even bf16
    sat at chance) an int8 Trainer run LEARNS through both the
    single-step and the STEPS_PER_DISPATCH scan dispatch, its final
    accuracy AGREES with a bf16 control run, and the quantized tree is
    built exactly once."""

    def _run(self, k_disp, int8, static=False, attn=False):
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.engine.trainer import Trainer, batch_iterator

        cfg = get_default_config()
        cfg.DATASET.DATASET = "synthetic"
        cfg.DATASET.NUM_CLASSES = 4
        cfg.MODEL.NUM_CLASSES = 4
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
        cfg.TRAIN.END_EPOCH = 6
        cfg.TRAIN.LR = 0.05
        cfg.TPU.INT8_FWD_TRAIN = int8
        cfg.TPU.INT8_BWD_DX = int8
        cfg.TPU.INT8_STATIC_ACT = static
        cfg.TPU.INT8_ATTN = attn
        cfg.TPU.STEPS_PER_DISPATCH = k_disp
        cfg.TPU.PREFETCH_DEPTH = 0

        vit = VisionTransformer(
            image_size=16, patch_size=8, width=32, layers=2, heads=2,
            style="timm", use_flash=False, int8_train=int8,
            int8_attn=attn,
            spec=PEFTSpec(method="lora", attn_delta="lora",
                          lora_rank=2, lora_alpha=8.0),
        )
        model = ImageClassifier(backbone=vit, num_classes=4)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
        )["params"]
        mask = build_mask(params, "lora", num_layers=2)

        # separable: class-coded global brightness (same recipe as
        # TestModel.test_convergence_parity) — bf16 and int8 both reach
        # 100% here, so a chance-level result is a real regression
        rng = np.random.RandomState(2)
        y = np.tile(np.arange(4), 16)
        x = rng.randn(64, 16, 16, 3).astype(np.float32) * 0.3
        x += np.linspace(-1, 1, 4)[y][:, None, None, None]

        trainer = Trainer(cfg, model, params, mask, steps_per_epoch=8)
        s0 = trainer.train_one_epoch(
            batch_iterator(x, y, 8, seed=0), epoch=0
        )
        cache_after_first = trainer._qk_cache
        if int8:
            assert cache_after_first is not None
            assert cache_after_first[0] is trainer.frozen
        else:
            assert cache_after_first is None
        if static:
            # the per-run calibration produced scalar per-layer scales
            assert trainer._qscale is not None
            scales = jax.tree_util.tree_leaves(trainer._qscale)
            assert scales and all(s.shape == () for s in scales)
            assert all(float(s) > 0 for s in scales)
        stats = s0
        for e in range(1, 6):
            stats = trainer.train_one_epoch(
                batch_iterator(x, y, 8, seed=e), epoch=e
            )
        if int8:
            # per-RUN: the cached tree object is the same one throughout
            assert trainer._qk_cache is cache_after_first
        assert stats["loss"] < 0.5 * s0["loss"], (stats["loss"], s0["loss"])
        acc = trainer.evaluate(
            batch_iterator(x, y, 8, shuffle=False, drop_last=False)
        )
        return acc

    def _gate(self, k_disp, static=False, attn=False):
        acc_q = self._run(k_disp, int8=True, static=static, attn=attn)
        acc_fp = self._run(k_disp, int8=False)
        # both learn (well past the 25% chance level) ...
        assert acc_q > 90.0, acc_q
        assert acc_fp > 90.0, acc_fp
        # ... and int8 agrees with the bf16 control
        assert abs(acc_q - acc_fp) <= 5.0, (acc_q, acc_fp)

    def test_single_step_dispatch(self):
        self._gate(1)

    def test_scan_dispatch(self):
        self._gate(2)

    def test_static_act_single_step(self):
        """TPU.INT8_STATIC_ACT learning gate: the statically-quantized
        Trainer run learns and agrees with bf16 (VERDICT r4 #3)."""
        self._gate(1, static=True)

    def test_static_act_scan(self):
        self._gate(2, static=True)

    def test_int8_attn_single_step(self):
        """TPU.INT8_ATTN learning gate: with the attention score and
        PV dots ALSO on the int8 path (statically-scaled q/k/v, exact
        1/127 softmax scale), a Trainer run still learns and agrees
        with the bf16 control (VERDICT r4 missing #1: the attention
        chain was the last GEMM class outside the int8 recipe)."""
        self._gate(1, static=True, attn=True)

    def test_int8_attn_scan(self):
        self._gate(2, static=True, attn=True)


class TestInt8Attention:
    """TPU.INT8_ATTN op + wiring (round 5).  The attention score and
    PV dots ride the int8 MXU with statically-calibrated q/k/v scales;
    the softmax output's [0, 1] range makes its 1/127 scale exact with
    no calibration.  Backward is the bf16-exact attention VJP."""

    def _qkv(self, seed=0, B=2, H=3, N=17, D=8):
        rng = np.random.RandomState(seed)
        mk = lambda: jnp.asarray(rng.randn(B, H, N, D).astype(np.float32) * 0.5)
        q, k, v = mk(), mk(), mk()
        s = lambda t: jnp.float32(float(jnp.max(jnp.abs(t))) / 127.0)
        return q, k, v, s(q), s(k), s(v)

    def test_forward_close_to_reference(self):
        from peft_vit_tpu.ops.attention import (
            attention_reference, int8_attention,
        )

        q, k, v, s_q, s_k, s_v = self._qkv()
        scale = 1.0 / np.sqrt(q.shape[-1])
        ref = attention_reference(q, k, v, None, float(scale), True)
        # default (QK^T only): softmax renormalizes the score noise
        out = int8_attention(q, k, v, s_q, s_k, s_v, float(scale), True)
        rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        assert rel < 0.05, rel
        # +PV: adds the P/V quantization noise (~1/127 per operand;
        # measured 0.055 on this seed)
        out_pv = int8_attention(
            q, k, v, s_q, s_k, s_v, float(scale), True, True
        )
        rel_pv = float(
            jnp.max(jnp.abs(out_pv - ref)) / jnp.max(jnp.abs(ref))
        )
        assert rel_pv < 0.08, rel_pv

    def test_backward_is_reference_vjp(self):
        """Cotangents equal the reference attention's exactly — the
        QLoRA asymmetry: quantize is forward-only, grads see clean
        math (a straight-through-quantized backward would be ~zero
        through jnp.round)."""
        from peft_vit_tpu.ops.attention import (
            attention_reference, int8_attention,
        )

        q, k, v, s_q, s_k, s_v = self._qkv(seed=1)
        scale = 1.0 / np.sqrt(q.shape[-1])
        g = jnp.asarray(
            np.random.RandomState(9).randn(*q.shape).astype(np.float32)
        )
        _, vjp_i = jax.vjp(
            lambda a, b, c: int8_attention(
                a, b, c, s_q, s_k, s_v, float(scale), True
            ), q, k, v,
        )
        _, vjp_r = jax.vjp(
            lambda a, b, c: attention_reference(
                a, b, c, None, float(scale), True
            ), q, k, v,
        )
        for gi, gr in zip(vjp_i(g), vjp_r(g)):
            np.testing.assert_allclose(
                np.asarray(gi), np.asarray(gr), rtol=1e-6, atol=1e-6
            )

    def test_softmax_scale_is_exact(self):
        """PV variant (TPU.INT8_ATTN_PV): P in [0, 1] quantized at 127
        round-trips the extremes exactly — rows that softmax to
        ~one-hot lose nothing.  (The PV dot is opt-in and measured
        UNSTABLE in training — int8_attention docstring — but the op
        math itself is exact at the softmax extremes.)"""
        from peft_vit_tpu.ops.attention import int8_attention

        B, H, N, D = 1, 1, 4, 8
        # huge score margins -> softmax saturates to one-hot
        q = jnp.zeros((B, H, N, D)).at[0, 0, :, 0].set(100.0)
        k = jnp.zeros((B, H, N, D)).at[0, 0, :, 0].set(
            jnp.asarray([1.0, -1.0, -1.0, -1.0])
        )
        v = jnp.asarray(
            np.random.RandomState(3).randn(B, H, N, D).astype(np.float32)
        )
        s_unit = jnp.float32(100.0 / 127.0)
        s_v = jnp.float32(float(jnp.max(jnp.abs(v))) / 127.0)
        out = int8_attention(
            q, k, v, s_unit, s_unit, s_v, 1.0, True, True
        )
        # every query row attends (numerically) only to key 0 -> v[0]
        want = jnp.round(jnp.clip(v[0, 0, 0] / s_v, -127, 127)) * s_v
        np.testing.assert_allclose(
            np.asarray(out[0, 0, 1]), np.asarray(want), atol=1e-5
        )

    def test_calibration_maps_qkv_scales(self):
        """MultiHeadAttention sows amax_q/k/v under int8_attn and
        activation_scales_from_stats emits sibling s_q/s_k/s_v — the
        same collection round-trip the Trainer's per-epoch calibration
        performs."""
        from peft_vit_tpu.models.layers import MultiHeadAttention
        from peft_vit_tpu.ops.int8 import activation_scales_from_stats

        mha = MultiHeadAttention(
            32, 4, int8=True, int8_bwd=True, int8_attn=True,
            use_flash=False,
        )
        x = jnp.asarray(
            np.random.RandomState(5).randn(2, 9, 32).astype(np.float32)
        )
        variables = mha.init(jax.random.PRNGKey(0), x)
        out1, st = mha.apply(variables, x, mutable=["qstats"])
        qs = activation_scales_from_stats(st["qstats"], margin=1.5)
        flat = jax.tree_util.tree_leaves_with_path(qs)
        names = {p[-1].key for p, _ in flat}
        assert {"s_q", "s_k", "s_v", "s_x"} <= names, names
        # feeding the scales back switches the attention onto the int8
        # path; output stays close to the un-calibrated forward
        out2 = mha.apply({**variables, "qscale": qs}, x)
        rel = float(
            jnp.max(jnp.abs(out2 - out1)) / (jnp.max(jnp.abs(out1)) + 1e-9)
        )
        assert rel < 0.1, rel

    def test_factory_requires_static_act(self):
        import pytest

        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import spec_from_config

        cfg = get_default_config()
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.MODEL.NAME = "clip_tiny"
        cfg.MODEL.SPEC.EMBED_DIM = 32
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
        cfg.MODEL.SPEC.VISION.WIDTH = 32
        cfg.MODEL.SPEC.VISION.LAYERS = 2
        cfg.MODEL.SPEC.VISION.HEADS = 2
        cfg.TPU.INT8_ATTN = True  # without INT8_STATIC_ACT
        with pytest.raises(ValueError, match="INT8_STATIC_ACT"):
            build_image_classifier(cfg, spec_from_config(cfg), 5)


class TestSweepPrequant:
    """TPU.INT8_FWD_TRAIN through the SWEEP engine (VERDICT r4 #5): the
    frozen tower is shared by every sweep cell, so its Int8Dense kernels
    are pre-quantized ONCE per sweep (SweepEngine(qkernel=...)) instead
    of re-quantized inside every training step.  Gates: (a) a sweep cell
    with the pre-quantized tree matches the per-call-quantize fallback
    exactly (the prequant op is bit-identical to int8_matmul by
    construction); (b) the qkernel collection is actually CONSUMED by
    the cells (corrupting it changes the logits); (c) finetune_main
    wires the tree in (the reference's hottest loop,
    adapter_tuning_clip.py:173-225)."""

    def _mk(self, qkernel):
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.engine import SweepEngine, ce_per_example

        model = _model(True)
        x0 = jnp.zeros((1, 16, 16, 3))
        params = model.init(jax.random.PRNGKey(0), x0)["params"]
        mask = build_mask(params, "lora", num_layers=2)
        _, frozen = split_params(params, mask)

        def init_trainable(rng):
            t, _ = split_params(model.init(rng, x0)["params"], mask)
            return t

        cfg = get_default_config()
        cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
        cfg.TRAIN.SCHEDULE = []
        engine = SweepEngine(
            cfg,
            lambda v, x, train: model.apply(v, x, train),
            init_trainable,
            frozen,
            ce_per_example,
            qkernel=qkernel,
        )
        return engine, frozen

    def _task(self):
        from peft_vit_tpu.engine import make_array_task

        rng = np.random.RandomState(2)
        y = np.tile(np.arange(5), 8)
        x = rng.randn(40, 16, 16, 3).astype(np.float32) * 0.3
        x += np.linspace(-1, 1, 5)[y][:, None, None, None]
        return make_array_task(x[:24], y[:24], x[24:], y[24:], 8)

    def test_prequant_matches_fallback_and_is_consumed(self):
        from peft_vit_tpu.ops.int8 import quantize_frozen_tree

        task = self._task()
        eng_fb, frozen = self._mk(None)
        qk = quantize_frozen_tree(frozen)
        eng_q, _ = self._mk(qk)

        s_fb = eng_fb.train_cells([3e-3], [1e-4], task, 3)
        s_q = eng_q.train_cells([3e-3], [1e-4], task, 3)
        # same quantize_cols output either way -> identical trajectories
        np.testing.assert_array_equal(s_q, s_fb)

        # consumption proof: a corrupted qkernel must change the cells'
        # behavior (if the collection were silently dropped, scores
        # would still match the fallback)
        bad = jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a) if a.dtype == jnp.int8 else a, qk
        )
        eng_bad, _ = self._mk(bad)
        s_bad = eng_bad.train_cells([3e-3], [1e-4], task, 3)
        assert not np.array_equal(s_bad, s_fb), (s_bad, s_fb)

    def test_finetune_main_wires_qkernel(self, monkeypatch, tmp_path):
        import peft_vit_tpu.commands.run as run_mod
        from peft_vit_tpu.config import get_default_config

        seen = {}
        real = run_mod.SweepEngine

        class Spy(real):
            def __init__(self, *a, **kw):
                seen["qkernel"] = kw.get("qkernel")
                super().__init__(*a, **kw)

        monkeypatch.setattr(run_mod, "SweepEngine", Spy)

        cfg = get_default_config()
        cfg.OUTPUT_DIR = str(tmp_path)
        cfg.DATASET.DATASET = "synthetic"
        cfg.DATASET.NUM_CLASSES = 4
        cfg.DATASET.NUM_SAMPLES_PER_CLASS = 8
        cfg.TRAIN.IMAGE_SIZE = [16, 16]
        cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
        cfg.TRAIN.END_EPOCH = 2
        cfg.TRAIN.SCHEDULE = []
        cfg.TRAIN.NO_TUNING = True
        cfg.TRAIN.LR = 0.02
        cfg.MODEL.NAME = "clip_tiny"
        cfg.MODEL.SPEC.EMBED_DIM = 32
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 8
        cfg.MODEL.SPEC.VISION.WIDTH = 32
        cfg.MODEL.SPEC.VISION.LAYERS = 2
        cfg.MODEL.SPEC.VISION.HEADS = 2
        cfg.PEFT.METHOD = "lora"
        cfg.TPU.INT8_FWD_TRAIN = True
        score = run_mod.finetune_main(cfg)
        qk = seen["qkernel"]
        assert qk is not None
        # the tree holds int8 kernels for the frozen tower's targets
        leaves = jax.tree_util.tree_leaves(qk)
        assert any(a.dtype == jnp.int8 for a in leaves)
        assert np.isfinite(score)

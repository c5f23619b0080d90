"""Kernel/op unit tests (SURVEY §4: test pyramid tier 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.ops.attention import (
    attention_reference,
    multi_head_attention,
)
from peft_vit_tpu.ops.phm import (
    factorized_phm_weight,
    kronecker_product_batched,
    phm_linear,
    phm_weight,
)
from peft_vit_tpu.ops.wht import wht_butterfly, wht_matmul


class TestFlashAttention:
    @pytest.mark.parametrize("n,d", [(64, 32), (197, 64)])
    def test_matches_reference(self, n, d):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, (2, 3, n, d)) for kk in ks)
        ref = attention_reference(q, k, v)
        out = multi_head_attention(q, k, v, use_flash=True, interpret=True)
        # atol 1e-2: interpret-mode accumulation order differs from the
        # jnp reference; observed max |err| 7.2e-3 on CPU (fp32 inputs)
        np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-2)

    def test_bnhd_matches_reference(self):
        """attention_bnhd (head-split-free layout; measured perf WASH on
        chip, kept as a documented negative — see its docstring) must
        equal the reference contraction and be differentiable."""
        from peft_vit_tpu.ops.attention import attention_bnhd

        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        b, n, h, d = 2, 17, 3, 8
        q, k, v = (jax.random.normal(kk, (b, n, h, d)) for kk in ks)
        bhnd = lambda t: t.transpose(0, 2, 1, 3)
        ref = attention_reference(bhnd(q), bhnd(k), bhnd(v))
        ref = ref.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = attention_bnhd(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
        )
        g = jax.grad(lambda q: attention_bnhd(q, k, v).sum())(q)
        assert np.isfinite(np.asarray(g)).all()

    def test_bf16_softmax_close_to_fp32(self):
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q, k, v = (
            jax.random.normal(kk, (2, 4, 197, 64), jnp.bfloat16)
            for kk in ks
        )
        ref = multi_head_attention(q, k, v, use_flash=False)
        fast = multi_head_attention(
            q, k, v, use_flash=False, softmax_fp32=False
        )
        np.testing.assert_allclose(
            np.asarray(fast, np.float32),
            np.asarray(ref, np.float32),
            atol=2e-2,
            rtol=2e-2,
        )
        # gradients flow and stay close
        g_ref = jax.grad(
            lambda q: jnp.sum(multi_head_attention(q, k, v, use_flash=False))
        )(q)
        g_fast = jax.grad(
            lambda q: jnp.sum(
                multi_head_attention(
                    q, k, v, use_flash=False, softmax_fp32=False
                )
            )
        )(q)
        np.testing.assert_allclose(
            np.asarray(g_fast, np.float32),
            np.asarray(g_ref, np.float32),
            atol=5e-2,
            rtol=5e-2,
        )

    def test_bias(self):
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        q, k, v = (jax.random.normal(kk, (1, 2, 50, 32)) for kk in ks[:3])
        bias = jax.random.normal(ks[3], (2, 50, 50)) * 0.5
        ref = attention_reference(q, k, v, bias)
        out = multi_head_attention(
            q, k, v, bias=bias, use_flash=True, interpret=True
        )
        np.testing.assert_allclose(out, ref, atol=5e-3, rtol=1e-2)

    def test_gradient_matches(self):
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        q, k, v = (jax.random.normal(kk, (1, 2, 33, 16)) for kk in ks)

        g1 = jax.grad(
            lambda q: multi_head_attention(
                q, k, v, use_flash=True, interpret=True
            ).sum()
        )(q)
        g2 = jax.grad(
            lambda q: attention_reference(q, k, v).sum()
        )(q)
        np.testing.assert_allclose(g1, g2, atol=1e-4, rtol=1e-3)

    @pytest.mark.parametrize("b,h,n,d", [(2, 4, 197, 64), (1, 3, 50, 32)])
    def test_fused_short_matches_reference(self, b, h, n, d):
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in ks)
        ref = attention_reference(q, k, v)
        out = multi_head_attention(q, k, v, use_fused=True, interpret=True)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

    def test_fused_short_gradients(self):
        ks = jax.random.split(jax.random.PRNGKey(8), 3)
        q, k, v = (jax.random.normal(kk, (2, 2, 67, 32)) for kk in ks)

        def f(fn):
            return jax.grad(
                lambda q, k, v: jnp.sum(jnp.cos(fn(q, k, v))),
                argnums=(0, 1, 2),
            )(q, k, v)

        g_new = f(
            lambda q, k, v: multi_head_attention(
                q, k, v, use_fused=True, interpret=True
            )
        )
        g_ref = f(attention_reference)
        for a, b_ in zip(g_new, g_ref):
            np.testing.assert_allclose(a, b_, atol=1e-5, rtol=1e-4)

    def test_batch_chunk_matches_reference(self):
        """TPU.ATTN_BATCH_CHUNK: the lax.map-sliced path must be exact in
        forward AND gradient (the custom recompute backward chunks too)."""
        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        q, k, v = (jax.random.normal(kk, (8, 2, 33, 16)) for kk in ks)
        ref = attention_reference(q, k, v)
        out = multi_head_attention(q, k, v, use_flash=False, batch_chunk=2)
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)

        def g(fn):
            return jax.grad(
                lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v))),
                argnums=(0, 1, 2),
            )(q, k, v)

        g_chunk = g(
            lambda q, k, v: multi_head_attention(
                q, k, v, use_flash=False, batch_chunk=4
            )
        )
        g_ref = g(attention_reference)
        for a, b_ in zip(g_chunk, g_ref):
            np.testing.assert_allclose(a, b_, atol=1e-5, rtol=1e-4)

    def test_batch_chunk_falls_through_on_indivisible_batch(self):
        ks = jax.random.split(jax.random.PRNGKey(12), 3)
        q, k, v = (jax.random.normal(kk, (3, 2, 17, 8)) for kk in ks)
        out = multi_head_attention(q, k, v, use_flash=False, batch_chunk=2)
        np.testing.assert_allclose(
            out, attention_reference(q, k, v), atol=1e-5, rtol=1e-5
        )

    def test_causal_mask_equals_explicit(self):
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q, k, v = (jax.random.normal(kk, (1, 2, 16, 8)) for kk in ks)
        bias = jnp.triu(jnp.full((16, 16), -1e30), k=1)
        bias = jnp.broadcast_to(bias[None], (2, 16, 16))
        out = attention_reference(q, k, v, bias)
        # row i attends only to <= i
        p = np.asarray(out[0, 0])
        expected0 = np.asarray(v[0, 0, 0])  # first row sees only itself
        np.testing.assert_allclose(p[0], expected0, atol=1e-5)


class TestPHM:
    def test_kronecker_matches_numpy(self):
        rng = np.random.RandomState(0)
        a = rng.randn(3, 2, 4).astype(np.float32)
        b = rng.randn(3, 5, 6).astype(np.float32)
        out = kronecker_product_batched(jnp.asarray(a), jnp.asarray(b))
        expect = np.stack([np.kron(a[i], b[i]) for i in range(3)])
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_phm_linear_equals_dense(self):
        """PHM with phm_dim=1 degenerates to a plain matmul."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(4, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(1, 8, 6).astype(np.float32))
        rule = jnp.ones((1, 1, 1), jnp.float32)
        out = phm_linear(x, rule, w)
        np.testing.assert_allclose(out, x @ w[0], atol=1e-5)

    def test_phm_weight_shape(self):
        rule = jnp.zeros((4, 4, 4))
        w = jnp.zeros((4, 16, 192))
        assert phm_weight(rule, w).shape == (64, 768)

    def test_factorized_matches_full(self):
        rng = np.random.RandomState(2)
        rule = jnp.asarray(rng.randn(2, 2, 2).astype(np.float32))
        wl = jnp.asarray(rng.randn(2, 3, 1).astype(np.float32))
        wr = jnp.asarray(rng.randn(2, 1, 3).astype(np.float32))
        full = jnp.einsum("nir,nro->nio", wl, wr)
        np.testing.assert_allclose(
            factorized_phm_weight(rule, wl, wr),
            phm_weight(rule, full),
            atol=1e-5,
        )


class TestWHT:
    @pytest.mark.parametrize("d", [2, 8, 64, 256])
    def test_butterfly_matches_matmul(self, d):
        x = jax.random.normal(jax.random.PRNGKey(0), (3, d))
        np.testing.assert_allclose(
            wht_butterfly(x), wht_matmul(x), atol=1e-4
        )

    def test_orthonormal(self):
        """H H^T = I for normalized WHT (Fastfood requires orthogonality;
        reference fastfood.py:81-121)."""
        d = 32
        eye = jnp.eye(d)
        h = wht_matmul(eye)
        np.testing.assert_allclose(h @ h.T, eye, atol=1e-5)

    def test_involution(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 16))
        np.testing.assert_allclose(
            wht_butterfly(wht_butterfly(x)), x, atol=1e-5
        )


class TestBf16LayerNorm:
    """TPU.BF16_LN fast path: statistics in the compute dtype (bf16)."""

    def test_bf16_stats_close_to_fp32(self):
        from peft_vit_tpu.models.layers import LayerNorm

        x = jax.random.normal(
            jax.random.PRNGKey(0), (4, 197, 768), jnp.bfloat16
        )
        ref_mod = LayerNorm(compute_fp32=True)
        fast_mod = LayerNorm(compute_fp32=False)
        v = ref_mod.init(jax.random.PRNGKey(1), x)
        ref = ref_mod.apply(v, x)
        fast = fast_mod.apply(v, x)
        np.testing.assert_allclose(
            np.asarray(fast, np.float32),
            np.asarray(ref, np.float32),
            atol=5e-2,
            rtol=5e-2,
        )

    def test_factory_plumbs_bf16_flags(self):
        """TPU.BF16_SOFTMAX / TPU.BF16_LN reach the ViT backbone."""
        from peft_vit_tpu.config import get_default_config
        from peft_vit_tpu.models.factory import build_image_classifier
        from peft_vit_tpu.peft import PEFTSpec

        cfg = get_default_config()
        cfg.defrost()
        cfg.MODEL.NAME = "clip_vit"
        cfg.MODEL.SPEC.VISION.LAYERS = 1
        cfg.MODEL.SPEC.VISION.WIDTH = 64
        cfg.MODEL.SPEC.VISION.HEADS = 2
        cfg.MODEL.SPEC.VISION.PATCH_SIZE = 32
        cfg.MODEL.SPEC.EMBED_DIM = 32
        cfg.MODEL.SPEC.TEXT.WIDTH = 32
        cfg.MODEL.SPEC.TEXT.LAYERS = 1
        cfg.MODEL.SPEC.TEXT.HEADS = 2
        cfg.TRAIN.IMAGE_SIZE = [64, 64]
        cfg.TPU.BF16_SOFTMAX = True
        cfg.TPU.BF16_LN = True
        cfg.freeze()
        model, _, _ = build_image_classifier(
            cfg, PEFTSpec(method="none"), num_classes=3
        )
        assert model.backbone.softmax_fp32 is False
        assert model.backbone.ln_fp32 is False

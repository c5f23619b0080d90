"""Intrinsic-dimension (Fastfood/SAID/dense) tests
(SURVEY §4: Fastfood orthogonality stats; reference intrinsic/fastfood.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from peft_vit_tpu.peft.intrinsic import (
    build_projection,
    fastfood_transform,
    make_intrinsic_apply,
    materialize,
    select_intrinsic_targets,
)


def small_targets():
    return {
        "w1": jnp.asarray(np.random.RandomState(0).randn(8, 4), jnp.float32),
        "b1": jnp.asarray(np.random.RandomState(1).randn(4), jnp.float32),
    }


class TestFastfood:
    def test_zero_v_is_identity(self):
        """V=0 -> theta == theta0 (the reference's zeros init makes the
        wrapped model exactly the base model at step 0)."""
        t = small_targets()
        proj = build_projection(jax.random.PRNGKey(0), t, 6)
        out = materialize(proj, jnp.zeros((6,)))
        for k in t:
            np.testing.assert_array_equal(out[k], t[k])

    def test_linear_in_v(self):
        t = small_targets()
        proj = build_projection(jax.random.PRNGKey(0), t, 6)
        v = jnp.asarray(np.random.RandomState(2).randn(6), jnp.float32)
        a = materialize(proj, v)
        b = materialize(proj, 2 * v)
        for k in t:
            np.testing.assert_allclose(
                np.asarray(b[k] - t[k]),
                2 * np.asarray(a[k] - t[k]),
                rtol=1e-4, atol=1e-5,
            )

    def test_norm_preservation_stats(self):
        """Fastfood approximates a random projection: column norms of the
        implied P are ~1 on average (orthogonality stats)."""
        dd, d = 256, 16
        leaf_tree = {"w": jnp.zeros((dd,), jnp.float32)}
        proj = build_projection(jax.random.PRNGKey(3), leaf_tree, d)
        leaf = proj.leaves["w"]
        norms = []
        for i in range(d):
            e = jnp.zeros((d,)).at[i].set(1.0)
            ray = fastfood_transform(e, leaf)
            norms.append(float(jnp.linalg.norm(ray)))
        mean_norm = np.mean(norms)
        assert 0.5 < mean_norm < 2.0, norms

    def test_dense_matches_matmul(self):
        t = {"w": jnp.zeros((12,), jnp.float32)}
        proj = build_projection(jax.random.PRNGKey(0), t, 4, kind="dense")
        v = jnp.asarray([1.0, -1.0, 0.5, 2.0])
        out = materialize(proj, v)
        expect = proj.leaves["w"] @ v
        np.testing.assert_allclose(out["w"], expect, rtol=1e-5)

    def test_said_scales(self):
        t = small_targets()
        proj = build_projection(jax.random.PRNGKey(0), t, 6)
        v = jnp.ones((6,))
        said = {k: jnp.asarray(0.0) for k in proj.theta0}
        out = materialize(proj, v, said)
        for k in t:
            np.testing.assert_array_equal(out[k], t[k])


class TestSelection:
    def test_layer_type_and_num(self):
        params = {
            "blocks_0": {"attn": {"k": jnp.zeros(2)}, "mlp": {"k": jnp.zeros(2)}},
            "blocks_1": {"attn": {"k": jnp.zeros(2)}, "mlp": {"k": jnp.zeros(2)}},
            "classifier": {"head": {"kernel": jnp.zeros(2)}},
        }
        m = select_intrinsic_targets(params, "mlp", 1)
        assert m["blocks_1/mlp/k"]
        assert not m["blocks_0/mlp/k"]
        assert not m["blocks_1/attn/k"]
        assert not m["classifier/head/kernel"]


class TestEndToEnd:
    def test_trains_through_projection(self):
        """d-dim V actually reduces a loss through the reparameterized
        weights (gradient flows through WHT/permutation/scaling)."""
        rng = np.random.RandomState(0)
        w0 = jnp.zeros((4, 3))
        x = jnp.asarray(rng.randn(16, 4), jnp.float32)
        y = jnp.asarray(rng.randint(0, 3, 16))

        def model_apply(variables, xx, train):
            return xx @ variables["params"]["w"]

        proj = build_projection(
            jax.random.PRNGKey(1), {"w": w0}, 5
        )
        apply_fn, trainable, frozen = make_intrinsic_apply(
            model_apply, proj, {"w": w0}
        )

        def loss(t):
            logits = apply_fn({"params": t}, x, True)
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(
                jnp.take_along_axis(logp, y[:, None], axis=1)
            )

        v = trainable
        l0 = float(loss(v))
        for _ in range(50):
            g = jax.grad(loss)(v)
            v = jax.tree_util.tree_map(lambda p, gg: p - 0.5 * gg, v, g)
        l1 = float(loss(v))
        assert l1 < l0 - 0.05, (l0, l1)

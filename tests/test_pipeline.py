"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a
``pipe`` mesh axis via shard_map + ppermute.

Parity is exact: the pipelined stack must match sequential layer
application in both the forward activations and (because every
collective is differentiable) the parameter gradients, including when a
``data`` axis shards the batch in the same mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from peft_vit_tpu.models.layers import Block
from peft_vit_tpu.parallel.pipeline import (
    pipeline_apply,
    stage_params,
    unstage_params,
)

L, D, H = 8, 16, 2


@pytest.fixture(scope="module")
def stack():
    block = Block(D, H, use_flash=False)
    x0 = jnp.zeros((1, 5, D), jnp.float32)

    def init_one(key):
        return block.init(key, x0)["params"]

    keys = jax.random.split(jax.random.PRNGKey(0), L)
    stacked = jax.vmap(init_one)(keys)

    def block_fn(p, h):
        return block.apply({"params": p}, h)

    return block_fn, stacked


def sequential(block_fn, stacked, x):
    def body(c, p):
        return block_fn(p, c), None

    return jax.lax.scan(body, x, stacked)[0]


class TestPipeline:
    def test_stage_roundtrip(self, stack):
        _, stacked = stack
        staged = stage_params(stacked, 4)
        back = unstage_params(staged)
        for a, b in zip(
            jax.tree_util.tree_leaves(stacked),
            jax.tree_util.tree_leaves(back),
        ):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("microbatches", [1, 2, 4])
    def test_forward_parity_pipe_only(self, stack, microbatches):
        block_fn, stacked = stack
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
        staged = stage_params(stacked, 4)
        x = jnp.asarray(
            np.random.RandomState(0).randn(8, 5, D).astype(np.float32)
        )
        want = sequential(block_fn, stacked, x)
        got = pipeline_apply(
            block_fn, staged, x, mesh=mesh, microbatches=microbatches
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_forward_parity_data_x_pipe(self, stack):
        block_fn, stacked = stack
        mesh = Mesh(
            np.asarray(jax.devices()[:8]).reshape(2, 4),
            ("data", "pipe"),
        )
        staged = stage_params(stacked, 4)
        x = jnp.asarray(
            np.random.RandomState(1).randn(8, 5, D).astype(np.float32)
        )
        want = sequential(block_fn, stacked, x)
        got = pipeline_apply(
            block_fn,
            staged,
            x,
            mesh=mesh,
            microbatches=2,
            batch_axis="data",
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
        )

    def test_grad_parity(self, stack):
        """jax.grad through the pipeline IS pipelined backprop — the
        stacked-param gradients must match the sequential stack's."""
        block_fn, stacked = stack
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
        x = jnp.asarray(
            np.random.RandomState(2).randn(4, 5, D).astype(np.float32)
        )

        def loss_seq(p):
            return jnp.mean(sequential(block_fn, p, x) ** 2)

        def loss_pipe(staged_p):
            out = pipeline_apply(
                block_fn, staged_p, x, mesh=mesh, microbatches=2
            )
            return jnp.mean(out**2)

        g_seq = jax.grad(loss_seq)(stacked)
        g_pipe = unstage_params(
            jax.grad(loss_pipe)(stage_params(stacked, 4))
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_seq),
            jax.tree_util.tree_leaves(g_pipe),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            )

    def test_vit_pipeline_forward_matches_plain(self):
        """The real flagship model (scan_layers ViT + LoRA + head):
        pipelined logits == plain logits, and grads w.r.t. the full
        variables flow through the staged reshape."""
        from peft_vit_tpu.models import (
            ImageClassifier,
            VisionTransformer,
        )
        from peft_vit_tpu.parallel.pipeline import vit_pipeline_forward
        from peft_vit_tpu.peft import PEFTSpec

        spec = PEFTSpec(
            method="lora",
            attn_delta="lora",
            lora_rank=2,
            lora_alpha=8.0,
            lora_post_scale_q=True,
        )
        model = ImageClassifier(
            backbone=VisionTransformer(
                image_size=32,
                patch_size=16,
                width=D,
                layers=L,
                heads=H,
                style="clip",
                output_dim=8,
                spec=spec,
                use_flash=False,
                scan_layers=True,
            ),
            num_classes=5,
        )
        x = jnp.asarray(
            np.random.RandomState(4)
            .randn(4, 32, 32, 3)
            .astype(np.float32)
        )
        variables = {
            "params": model.init(jax.random.PRNGKey(0), x)["params"]
        }
        # LoRA B-matrices init to zero; perturb so deltas matter
        variables = jax.tree_util.tree_map(
            lambda t: t + 0.01, variables
        )
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
        want = model.apply(variables, x, False)
        got = vit_pipeline_forward(
            model, variables, x, mesh=mesh, microbatches=2
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )

        def loss_pipe(v):
            out = vit_pipeline_forward(
                model, v, x, mesh=mesh, microbatches=2
            )
            return jnp.mean(out**2)

        def loss_plain(v):
            return jnp.mean(model.apply(v, x, False) ** 2)

        g_pipe = jax.grad(loss_pipe)(variables)
        g_plain = jax.grad(loss_plain)(variables)
        flat_p = jax.tree_util.tree_leaves(g_pipe)
        flat_q = jax.tree_util.tree_leaves(g_plain)
        for a, b in zip(flat_p, flat_q):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
            )

    def test_jit_train_step_with_sharded_params(self, stack):
        """A jitted SGD step over pipe-sharded device arrays executes
        and decreases the loss."""
        block_fn, stacked = stack
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("pipe",))
        staged = stage_params(stacked, 4)
        shardings = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P("pipe")), staged
        )
        staged = jax.device_put(staged, shardings)
        x = jnp.asarray(
            np.random.RandomState(3).randn(4, 5, D).astype(np.float32)
        )

        @jax.jit
        def step(p):
            def loss(p):
                out = pipeline_apply(
                    block_fn, p, x, mesh=mesh, microbatches=2
                )
                return jnp.mean(out**2)

            l, g = jax.value_and_grad(loss)(p)
            p = jax.tree_util.tree_map(lambda a, b: a - 1e-2 * b, p, g)
            return p, l

        p1, l0 = step(staged)
        _, l1 = step(p1)
        assert np.isfinite(l0) and float(l1) < float(l0)

"""GEMM patchify (TPU.PATCH_EMBED_GEMM) vs the strided-conv formulation.

The conv with C_in=3 runs ~18 TF/s on the v5e MXU plus an input layout
copy (~7% of the LoRA train step, BASELINE.md round-3 xprof); the
dot_general form is a K=p*p*c GEMM at full rate.  Param tree must be
byte-compatible ("conv1/kernel" (P,P,C,W), optional bias) so converted
reference checkpoints load into either formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.models import VisionTransformer
from peft_vit_tpu.peft import PEFTSpec


def build(patch_gemm, style="clip", **kw):
    return VisionTransformer(
        image_size=32,
        patch_size=16,
        width=64,
        layers=2,
        heads=2,
        style=style,
        output_dim=32 if style == "clip" else None,
        spec=kw.pop("spec", PEFTSpec()),
        use_flash=False,
        dtype=jnp.float32,
        patch_gemm=patch_gemm,
        **kw,
    )


@pytest.mark.parametrize("style", ["clip", "timm"])
def test_param_tree_identical(style):
    x = jnp.zeros((1, 32, 32, 3))
    p0 = build(False, style).init(jax.random.PRNGKey(0), x)["params"]
    p1 = build(True, style).init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(p0) == (
        jax.tree_util.tree_structure(p1)
    )
    assert jax.tree_util.tree_map(jnp.shape, p0) == (
        jax.tree_util.tree_map(jnp.shape, p1)
    )


@pytest.mark.parametrize("style", ["clip", "timm"])
def test_forward_parity_same_params(style):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    m0, m1 = build(False, style), build(True, style)
    p = m0.init(jax.random.PRNGKey(0), x)["params"]
    a = m0.apply({"params": p}, x, True)
    b = m1.apply({"params": p}, x, True)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
    )


def test_gradients_flow_with_lora():
    """The GEMM patchify must be transparent to the PEFT train path."""
    from peft_vit_tpu.engine import ce_per_example
    from peft_vit_tpu.peft import build_mask, merge_params, split_params

    spec = PEFTSpec(method="lora", attn_delta="lora", lora_rank=2)
    m = build(True, "clip", spec=spec)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray([0, 1])
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    mask = build_mask(params, "lora", num_layers=2)
    trainable, frozen = split_params(params, mask)

    def loss_fn(t):
        p = merge_params(t, frozen)
        feats = m.apply({"params": p}, x, True)
        return jnp.mean(
            ce_per_example(feats[:, :2].astype(jnp.float32), y)
        )

    grads = jax.grad(loss_fn)(trainable)
    norms = [
        float(jnp.linalg.norm(g))
        for g in jax.tree_util.tree_leaves(grads)
    ]
    assert any(n > 0 for n in norms)
    assert all(np.isfinite(n) for n in norms)

"""Scan-over-layers: exact parity with the unrolled ViT, stacked-param
conversion round-trips, eligibility gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from peft_vit_tpu.models import VisionTransformer
from peft_vit_tpu.models.convert import (
    stack_flat_blocks,
    unstack_flat_blocks,
)
from peft_vit_tpu.peft import PEFTSpec, build_mask


KW = dict(
    image_size=16,
    patch_size=8,
    width=32,
    layers=3,
    heads=2,
    style="clip",
    output_dim=32,
    use_flash=False,
)


def stacked_params_from_unrolled(pu, layers=3):
    flat = {
        k: np.asarray(v)
        for k, v in traverse_util.flatten_dict(pu, sep="/").items()
    }
    return traverse_util.unflatten_dict(
        {
            k: jnp.asarray(v)
            for k, v in stack_flat_blocks(flat, layers).items()
        },
        sep="/",
    )


class TestScanParity:
    @pytest.mark.parametrize(
        "spec",
        [
            PEFTSpec(),
            PEFTSpec(
                method="lora",
                attn_delta="lora",
                lora_rank=2,
                lora_post_scale_q=True,
            ),
            PEFTSpec(method="adapter", adapter="houlsby", adapter_dim=8),
        ],
        ids=["plain", "lora", "adapter"],
    )
    def test_scanned_equals_unrolled(self, spec):
        unrolled = VisionTransformer(spec=spec, **KW)
        scanned = VisionTransformer(spec=spec, scan_layers=True, **KW)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        pu = unrolled.init(jax.random.PRNGKey(0), x)["params"]
        ps = stacked_params_from_unrolled(pu)
        np.testing.assert_array_equal(
            np.asarray(unrolled.apply({"params": pu}, x)),
            np.asarray(scanned.apply({"params": ps}, x)),
        )

    def test_gradients_flow_through_scan(self):
        spec = PEFTSpec(method="lora", attn_delta="lora", lora_rank=2)
        scanned = VisionTransformer(spec=spec, scan_layers=True, **KW)
        x = jnp.ones((1, 16, 16, 3))
        ps = scanned.init(jax.random.PRNGKey(0), x)["params"]
        mask = build_mask(ps, "lora", num_layers=3, train_head=False)
        from peft_vit_tpu.peft import merge_params, split_params

        t, f = split_params(ps, mask)

        def loss(t):
            return jnp.sum(
                scanned.apply({"params": merge_params(t, f)}, x) ** 2
            )

        g = jax.grad(loss)(t)
        leaves = [
            v for v in jax.tree_util.tree_leaves(g) if v is not None
        ]
        assert leaves
        # A-matrices get nonzero grads (B=0 blocks grads only to B inputs)
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0

    def test_roundtrip(self):
        m = VisionTransformer(**KW)
        pu = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))[
            "params"
        ]
        flat = {
            k: np.asarray(v)
            for k, v in traverse_util.flatten_dict(pu, sep="/").items()
        }
        back = unstack_flat_blocks(stack_flat_blocks(flat, 3))
        assert set(back) == set(flat)
        for k in flat:
            np.testing.assert_array_equal(back[k], flat[k])


class TestScanGating:
    def test_per_layer_specs_fall_back(self):
        """AdapterDrop / deep prompts / extra block need unrolled params:
        scan must decline so the param tree stays layer-addressable."""
        for spec in (
            PEFTSpec(
                method="adapterdrop",
                adapter="houlsby",
                adapter_layers=(1,),
            ),
            PEFTSpec(method="vpt", prompt_tokens=2, prompt_deep=True),
            PEFTSpec(method="transformer_probe", extra_block=True),
        ):
            m = VisionTransformer(spec=spec, scan_layers=True, **KW)
            p = m.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
            )["params"]
            flat = traverse_util.flatten_dict(p, sep="/")
            assert any(k.startswith("blocks_0/") for k in flat), spec

"""Combo-method / MoE / TWO_LR tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.engine.train import (
    TrainCellState,
    init_cell_state,
    sgd_update,
)
from peft_vit_tpu.models import VisionTransformer
from peft_vit_tpu.peft import PEFTSpec, build_mask, spec_from_config

X = jnp.ones((2, 16, 16, 3))


def vit_for(method, width=32):
    cfg = get_default_config()
    cfg.PEFT.METHOD = method
    spec = spec_from_config(cfg)
    return (
        VisionTransformer(
            image_size=16,
            patch_size=8,
            width=width,
            layers=2,
            heads=2,
            style="timm",
            spec=spec,
            use_flash=False,
        ),
        spec,
    )


class TestComboMethods:
    @pytest.mark.parametrize(
        "method,width,expect",
        [
            ("lora_moe", 32, "moe_adapter1"),
            ("lora_adapter", 32, "qkv_adapter"),
            ("lora_compacter", 96, "compacter"),
            ("lora_drop_adapter", 32, "/adapter/"),
        ],
    )
    def test_params_exist_and_forward(self, method, width, expect):
        m, spec = vit_for(method, width)
        p = m.init(jax.random.PRNGKey(0), X)["params"]
        flat = traverse_util.flatten_dict(p, sep="/")
        assert any(expect in k for k in flat), sorted(flat)[:5]
        out = m.apply({"params": p}, X)
        assert np.isfinite(np.asarray(out)).all()

    def test_first_block_filters(self):
        m, _ = vit_for("lora")
        p = m.init(jax.random.PRNGKey(0), X)["params"]
        for method, frag in (
            ("first_attention", "blocks_1/attn"),
            ("first_mlp", "blocks_1/mlp"),
        ):
            mask = build_mask(p, method, num_layers=2, train_head=False)
            flat = traverse_util.flatten_dict(mask, sep="/")
            chosen = [k for k, v in flat.items() if v]
            assert chosen and all(frag in k for k in chosen)

    def test_moe_gate_changes_output(self):
        """With a nonzero up-projection, gating changes the delta."""
        m_plain, _ = vit_for("lora")
        m_moe, _ = vit_for("lora_moe")
        p = m_moe.init(jax.random.PRNGKey(0), X)["params"]
        flat = traverse_util.flatten_dict(p, sep="/")
        for k in list(flat):
            if "adapter2" in k:
                flat[k] = jnp.ones_like(flat[k]) * 0.05
        p = traverse_util.unflatten_dict(flat, sep="/")
        p_plain = {
            k: v
            for k, v in p.items()
        }
        out_moe = m_moe.apply({"params": p}, X)
        # plain model ignores the moe gate params (unused)
        out_plain = m_plain.apply({"params": p}, X)
        assert float(jnp.abs(out_moe - out_plain).max()) > 1e-7


class TestTwoLR:
    def test_lr_scale_tree_applies(self):
        t = {"classifier": {"w": jnp.ones(2)}, "backbone": {"w": jnp.ones(2)}}
        g = {"classifier": {"w": jnp.ones(2)}, "backbone": {"w": jnp.ones(2)}}
        scale = {
            "classifier": {"w": jnp.asarray(1.0)},
            "backbone": {"w": jnp.asarray(0.1)},
        }
        st = init_cell_state(t)
        st2 = sgd_update(
            g, st, lr=jnp.asarray(1.0), wd=jnp.asarray(0.0),
            momentum=0.0, nesterov=False, lr_scale=scale,
        )
        d_head = float(t["classifier"]["w"][0] - st2.trainable["classifier"]["w"][0])
        d_back = float(t["backbone"]["w"][0] - st2.trainable["backbone"]["w"][0])
        assert abs(d_head - 1.0) < 1e-6
        assert abs(d_back - 0.1) < 1e-6

"""Cached-backbone sweep tests: prefix caching must be bit-equivalent."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.engine.cached import (
    first_trainable_layer,
    make_suffix_apply,
    precompute_prefix_tokens,
)
from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.peft import PEFTSpec, build_mask


def model_for(method, spec, layers=3):
    vit = VisionTransformer(
        image_size=16,
        patch_size=8,
        width=32,
        layers=layers,
        heads=2,
        style="clip",
        output_dim=32,
        spec=spec,
        use_flash=False,
    )
    m = ImageClassifier(backbone=vit, num_classes=4)
    x = jnp.zeros((1, 16, 16, 3))
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    return m, p, build_mask(p, method, num_layers=layers)


class TestFirstTrainableLayer:
    def test_linear_head_only(self):
        m, p, mask = model_for("linear", PEFTSpec())
        assert first_trainable_layer(mask, 3) == 3

    def test_adapterdrop_cut(self):
        spec = PEFTSpec(
            method="adapterdrop", adapter="houlsby", adapter_layers=(2,)
        )
        m, p, mask = model_for("adapterdrop", spec)
        # default mask (reference parity): every adapter trainable -> no cut
        assert first_trainable_layer(mask, 3) == 0
        # narrowed to executing layers (zero-grad-equivalent): cut at 2
        narrow = build_mask(
            p, "adapterdrop", num_layers=3, adapter_layers=(2,)
        )
        assert first_trainable_layer(narrow, 3) == 2

    def test_lora_no_cache(self):
        spec = PEFTSpec(method="lora", attn_delta="lora")
        m, p, mask = model_for("lora", spec)
        assert first_trainable_layer(mask, 3) == 0

    def test_probe_cut_is_full_depth(self):
        spec = PEFTSpec(method="transformer_probe", extra_block=True)
        m, p, mask = model_for("transformer_probe", spec)
        # the extra probe block (blocks_3) sits after the backbone
        assert first_trainable_layer(mask, 3) == 3

    def test_first_mlp_cut(self):
        m, p, mask = model_for("first_mlp", PEFTSpec())
        assert first_trainable_layer(mask, 3) == 1


class TestEquivalence:
    @pytest.mark.parametrize("cut", [1, 2, 3])
    def test_prefix_suffix_equals_full(self, cut):
        spec = PEFTSpec(method="transformer_probe", extra_block=True)
        model, params, _ = model_for("transformer_probe", spec)
        x = np.asarray(
            jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
        )
        full = model.apply({"params": params}, jnp.asarray(x), False)
        toks = precompute_prefix_tokens(model, params, x, cut, batch_size=2)
        suffix = make_suffix_apply(model, cut)
        out = suffix({"params": params}, jnp.asarray(toks), False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(full), atol=1e-5
        )

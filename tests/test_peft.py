"""PEFT math golden tests (SURVEY §4: LoRA delta == dense-weight-delta
equivalence, adapter residual structure, mask correctness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from peft_vit_tpu.config import get_default_config
from peft_vit_tpu.models import ImageClassifier, VisionTransformer
from peft_vit_tpu.peft import (
    PEFTSpec,
    build_mask,
    count_trainable,
    merge_params,
    spec_from_config,
    split_params,
)


def tiny_vit(spec, style="clip", layers=2, **kw):
    return VisionTransformer(
        image_size=16,
        patch_size=8,
        width=32,
        layers=layers,
        heads=2,
        style=style,
        output_dim=32 if style == "clip" else None,
        spec=spec,
        use_flash=False,
        **kw,
    )


X = jnp.linspace(-1, 1, 1 * 16 * 16 * 3).reshape(1, 16, 16, 3)


def init_and_apply(model, seed=0, x=X):
    params = model.init(jax.random.PRNGKey(seed), x)["params"]
    return params, model.apply({"params": params}, x)


class TestLoRA:
    def test_zero_at_init(self):
        """B=0 init => LoRA model == base model at init
        (lora_model.py:470-476: adapter2 weights zeroed)."""
        base = tiny_vit(PEFTSpec())
        lora = tiny_vit(
            PEFTSpec(method="lora", attn_delta="lora", lora_rank=2)
        )
        p_base, out_base = init_and_apply(base)
        p_lora = lora.init(jax.random.PRNGKey(0), X)["params"]
        # graft the base weights into the lora tree
        flat_l = traverse_util.flatten_dict(p_lora, sep="/")
        flat_b = traverse_util.flatten_dict(p_base, sep="/")
        for k, v in flat_b.items():
            flat_l[k] = v
        p_lora = traverse_util.unflatten_dict(flat_l, sep="/")
        out_lora = lora.apply({"params": p_lora}, X)
        np.testing.assert_allclose(out_lora, out_base, atol=1e-5)

    def test_delta_equals_dense_delta(self):
        """LoRA q/v delta == adding scale*B@A to the packed qkv weight
        (the defining low-rank-update property)."""
        spec = PEFTSpec(
            method="lora",
            attn_delta="lora",
            lora_rank=2,
            lora_alpha=4.0,
            lora_targets=("q", "v"),
            lora_post_scale_q=False,
        )
        lora = tiny_vit(spec, layers=1)
        params = lora.init(jax.random.PRNGKey(1), X)["params"]
        flat = traverse_util.flatten_dict(params, sep="/")
        rng = np.random.RandomState(0)
        for t in ("q", "v"):
            flat[f"blocks_0/attn/{t}_adapter2/kernel"] = jnp.asarray(
                rng.randn(2, 32).astype(np.float32) * 0.01
            )
        params = traverse_util.unflatten_dict(flat, sep="/")
        out_lora = lora.apply({"params": params}, X)

        # equivalent dense model: fold delta into in_proj
        base = tiny_vit(PEFTSpec(), layers=1)
        flat_b = traverse_util.flatten_dict(
            base.init(jax.random.PRNGKey(0), X)["params"], sep="/"
        )
        for k in flat_b:
            if k in flat:
                flat_b[k] = flat[k]
        scale = spec.lora_alpha / spec.lora_rank
        w = np.asarray(flat_b["blocks_0/attn/in_proj/kernel"]).copy()
        d = 32
        for i, t in enumerate(("q", "k", "v")):
            if t in ("q", "v"):
                a = np.asarray(flat[f"blocks_0/attn/{t}_adapter1/kernel"])
                b = np.asarray(flat[f"blocks_0/attn/{t}_adapter2/kernel"])
                w[:, i * d : (i + 1) * d] += scale * (a @ b)
        flat_b["blocks_0/attn/in_proj/kernel"] = jnp.asarray(w)
        p_dense = traverse_util.unflatten_dict(flat_b, sep="/")
        out_dense = base.apply({"params": p_dense}, X)
        np.testing.assert_allclose(out_lora, out_dense, atol=1e-4)

    def test_post_scale_quirk_changes_output(self):
        """The CLIP-parity post-scale q delta is NOT the textbook LoRA
        (lora_model.py:720-734); verify the flag actually changes math."""
        kw = dict(
            method="lora", attn_delta="lora", lora_rank=2, lora_alpha=4.0
        )
        m1 = tiny_vit(PEFTSpec(lora_post_scale_q=False, **kw), layers=1)
        m2 = tiny_vit(PEFTSpec(lora_post_scale_q=True, **kw), layers=1)
        params = m1.init(jax.random.PRNGKey(1), X)["params"]
        flat = traverse_util.flatten_dict(params, sep="/")
        rng = np.random.RandomState(0)
        flat["blocks_0/attn/q_adapter2/kernel"] = jnp.asarray(
            rng.randn(2, 32).astype(np.float32) * 0.1
        )
        params = traverse_util.unflatten_dict(flat, sep="/")
        o1 = m1.apply({"params": params}, X)
        o2 = m2.apply({"params": params}, X)
        assert float(jnp.abs(o1 - o2).max()) > 1e-6


class TestAdapters:
    def test_adapter_residual_structure(self):
        """x_out = x + mlp_out + adapter_delta; at BERT-init the up kernel
        is ~N(0, 0.02) — with zeroed up kernel the adapter is an exact
        no-op (adapter_model.py:268-281 residual path)."""
        spec = PEFTSpec(method="adapter", adapter="houlsby", adapter_dim=8)
        model = tiny_vit(spec, layers=1)
        params = model.init(jax.random.PRNGKey(0), X)["params"]
        flat = traverse_util.flatten_dict(params, sep="/")
        flat["blocks_0/adapter/up/kernel"] = jnp.zeros_like(
            flat["blocks_0/adapter/up/kernel"]
        )
        flat["blocks_0/adapter/up/bias"] = jnp.zeros_like(
            flat["blocks_0/adapter/up/bias"]
        )
        params0 = traverse_util.unflatten_dict(flat, sep="/")
        out0 = model.apply({"params": params0}, X)

        base = tiny_vit(PEFTSpec(), layers=1)
        flat_b = traverse_util.flatten_dict(
            base.init(jax.random.PRNGKey(0), X)["params"], sep="/"
        )
        for k in flat_b:
            flat_b[k] = flat[k]
        out_base = base.apply(
            {"params": traverse_util.unflatten_dict(flat_b, sep="/")}, X
        )
        np.testing.assert_allclose(out0, out_base, atol=1e-5)

    def test_adapterdrop_only_selected_layer_runs(self):
        """AdapterDrop: params exist in all blocks but only the selected
        layer's adapter affects the output (adapterdrop.py:582-587)."""
        spec_all = PEFTSpec(
            method="adapter", adapter="houlsby", adapter_dim=8
        )
        spec_drop = PEFTSpec(
            method="adapterdrop",
            adapter="houlsby",
            adapter_dim=8,
            adapter_layers=(1,),
        )
        m_all = tiny_vit(spec_all)
        m_drop = tiny_vit(spec_drop)
        params = m_all.init(jax.random.PRNGKey(0), X)["params"]
        # same param tree applies to both
        o_all = m_all.apply({"params": params}, X)
        o_drop = m_drop.apply({"params": params}, X)
        assert float(jnp.abs(o_all - o_drop).max()) > 1e-6

        # zeroing layer-1 adapter up-proj makes drop model == base
        flat = traverse_util.flatten_dict(params, sep="/")
        for k in list(flat):
            if "blocks_1/adapter/up" in k:
                flat[k] = jnp.zeros_like(flat[k])
        p0 = traverse_util.unflatten_dict(flat, sep="/")
        o_drop0 = m_drop.apply({"params": p0}, X)
        base = tiny_vit(PEFTSpec())
        flat_b = traverse_util.flatten_dict(
            base.init(jax.random.PRNGKey(0), X)["params"], sep="/"
        )
        for k in flat_b:
            flat_b[k] = flat[k]
        o_base = base.apply(
            {"params": traverse_util.unflatten_dict(flat_b, sep="/")}, X
        )
        np.testing.assert_allclose(o_drop0, o_base, atol=1e-5)


class TestMasks:
    def params_for(self, method, spec):
        model = ImageClassifier(
            backbone=tiny_vit(spec), num_classes=4
        )
        return model, model.init(jax.random.PRNGKey(0), X)["params"]

    @pytest.mark.parametrize(
        "method,spec,expect_substr",
        [
            ("bitfit", PEFTSpec(), "/bias"),
            ("layernorm", PEFTSpec(), "ln_"),
            ("attention", PEFTSpec(), "attn"),
            (
                "lora",
                PEFTSpec(method="lora", attn_delta="lora"),
                "adapter",
            ),
            (
                "adapter",
                PEFTSpec(method="adapter", adapter="houlsby"),
                "/adapter/",
            ),
        ],
    )
    def test_filters(self, method, spec, expect_substr):
        model, params = self.params_for(method, spec)
        mask = build_mask(params, method, num_layers=2)
        flat_m = traverse_util.flatten_dict(mask, sep="/")
        trainable = [k for k, v in flat_m.items() if v]
        assert trainable, method
        for k in trainable:
            assert (
                expect_substr in k
                or k.startswith("classifier/")
            ), (method, k)

    def test_lora_fix_one_subset_of_lora(self):
        spec = PEFTSpec(method="lora", attn_delta="lora")
        model, params = self.params_for("lora", spec)
        m_all = traverse_util.flatten_dict(
            build_mask(params, "lora", 2), sep="/"
        )
        m_one = traverse_util.flatten_dict(
            build_mask(params, "lora_fix_one", 2), sep="/"
        )
        for k, v in m_one.items():
            if v and not k.startswith("classifier/"):
                assert "adapter1" in k
                assert m_all[k]

    def test_split_merge_roundtrip(self):
        spec = PEFTSpec(method="lora", attn_delta="lora")
        model, params = self.params_for("lora", spec)
        mask = build_mask(params, "lora", num_layers=2)
        t, f = split_params(params, mask)
        merged = merge_params(t, f)
        flat_a = traverse_util.flatten_dict(params, sep="/")
        flat_b = traverse_util.flatten_dict(merged, sep="/")
        assert flat_a.keys() == flat_b.keys()
        for k in flat_a:
            np.testing.assert_array_equal(flat_a[k], flat_b[k])

    def test_grad_only_flows_to_trainable(self):
        spec = PEFTSpec(method="lora", attn_delta="lora")
        model, params = self.params_for("lora", spec)
        mask = build_mask(params, "lora", num_layers=2)
        t, f = split_params(params, mask)

        def loss(t):
            p = merge_params(t, f)
            return model.apply({"params": p}, X).sum()

        g = jax.grad(loss)(t)
        flat_g = traverse_util.flatten_dict(g, sep="/")
        flat_m = traverse_util.flatten_dict(mask, sep="/")
        for k, v in flat_g.items():
            assert (v is None) == (not flat_m[k])


class TestSpecFromConfig:
    def test_methods_resolve(self):
        cfg = get_default_config()
        for m in (
            "lora",
            "adapter",
            "compacter",
            "kadaptation",
            "bitfit",
            "vpt",
            "transformer_probe",
        ):
            cfg.PEFT.METHOD = m
            spec = spec_from_config(cfg)
            assert spec.method in (
                m,
                "vpt",
            )

    def test_kadaptation_spec(self):
        cfg = get_default_config()
        cfg.PEFT.METHOD = "kadaptation"
        cfg.PEFT.PHM_DIM = 8
        spec = spec_from_config(cfg)
        assert spec.attn_delta == "kron" and spec.phm_dim == 8

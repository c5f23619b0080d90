"""Whole-model parity against the EXECUTED reference.

Fixtures from tests/golden/generate_models_from_reference.py: the
reference's complete CLIP (adapter_model.py:397-530) and supervised ViT
(full_shot cls_vit.py) ran end-to-end at tiny widths; the npz stores the
full torch state dict + inputs + outputs.  These tests route the state
dict through OUR converters (clip_state_dict_to_tree /
timm_vit_state_dict_to_tree + graft) and compare the flax forward —
pinning model math AND checkpoint-key mapping in one shot, offline (the
real-checkpoint tests remain env-gated on downloaded weights).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from peft_vit_tpu.models import CLIP, VisionTransformer
from peft_vit_tpu.models.convert import (
    clip_state_dict_to_tree,
    graft,
    infer_clip_shape,
    timm_vit_state_dict_to_tree,
)

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _sd(g):
    return {
        k[len("sd__"):].replace("__", "."): np.asarray(v)
        for k, v in g.items()
        if k.startswith("sd__")
    }


class TestClipModelRefexec:
    def test_clip_end_to_end(self):
        """adapter_model.py's CLIP builds its VISUAL tower with
        kattention=True unconditionally (:372) — the reference 'CLIP'
        from the adapter file IS the adapter model, so this pins the
        full adapter-CLIP (double-mlp residual in every visual block,
        plain text tower) plus the converter's adapter-key mapping."""
        from peft_vit_tpu.peft import PEFTSpec

        g = np.load(os.path.join(GOLDEN, "refexec_clip_model.npz"))
        sd = _sd(g)
        info = infer_clip_shape(sd)
        spec = PEFTSpec(
            method="adapter",
            adapter="houlsby",
            adapter_dim=64,  # Adapter(d, down_sample=64), :305
            adapter_act="relu",
        )
        model = CLIP(
            spec=spec,
            embed_dim=info["embed_dim"],
            image_size=info["image_size"],
            patch_size=info["patch_size"],
            vision_width=info["vision_width"],
            vision_layers=info["vision_layers"],
            # the reference class hardcodes heads = width // 64
            vision_heads=max(info["vision_width"] // 64, 1),
            vocab_size=sd["token_embedding.weight"].shape[0],
            context_length=info["context_length"],
            text_width=info["text_width"],
            text_layers=info["text_layers"],
            text_heads=int(g["theads"]),
            use_flash=False,
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)  # NCHW -> NHWC
        toks = jnp.asarray(g["toks"])
        params = model.init(jax.random.PRNGKey(0), x, toks)["params"]
        params, missing = graft(params, clip_state_dict_to_tree(sd))
        assert not missing
        fi = model.apply({"params": params}, x,
                         method=CLIP.encode_image)
        ft = model.apply({"params": params}, toks,
                         method=CLIP.encode_text)
        li, _ = model.apply({"params": params}, x, toks)
        np.testing.assert_allclose(
            np.asarray(fi), g["feats_img"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ft), g["feats_txt"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(li), g["logits_img"], rtol=1e-4, atol=1e-4
        )


class TestClsVitRefexec:
    def test_supervised_vit_end_to_end(self):
        g = np.load(os.path.join(GOLDEN, "refexec_cls_vit.npz"))
        sd = _sd(g)
        width = sd["cls_token"].shape[-1]
        layers = len(
            {k.split(".")[1] for k in sd if k.startswith("blocks.")}
        )
        patch = sd["patch_embed.proj.weight"].shape[-1]
        n_patches = sd["pos_embed"].shape[1] - 1
        image = patch * int(np.sqrt(n_patches))
        model = VisionTransformer(
            image_size=image,
            patch_size=patch,
            width=width,
            layers=layers,
            heads=int(g["heads"]),
            style="timm",
            use_flash=False,
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        params, missing = graft(params, timm_vit_state_dict_to_tree(sd))
        assert not missing
        feats = model.apply({"params": params}, x, False)
        np.testing.assert_allclose(
            np.asarray(feats), g["feats"], rtol=1e-4, atol=1e-5
        )
        logits = (
            np.asarray(feats) @ sd["head.weight"].T + sd["head.bias"]
        )
        np.testing.assert_allclose(
            logits, g["logits"], rtol=1e-4, atol=1e-5
        )


class TestLoraClipRefexec:
    def test_lora_clip_end_to_end(self):
        """lora_model.py's CLIP: every visual block runs the custom LoRA
        MultiheadAttention (rank 4, alpha 128, post-scale-q, :720-742);
        batch=1 with vision heads = width//64 = 1 makes the delta-reshape
        scramble the identity, so this pins the executed post-scale-q
        tower end-to-end plus the converter's LoRA-key mapping."""
        from peft_vit_tpu.peft import PEFTSpec

        g = np.load(os.path.join(GOLDEN, "refexec_lora_clip_model.npz"))
        sd = _sd(g)
        info = infer_clip_shape(sd)
        spec = PEFTSpec(
            method="lora",
            attn_delta="lora",
            lora_rank=4,  # lora_attn_dim (lora_model.py:465)
            lora_alpha=128.0,  # lora_attn_alpha (:469)
            lora_post_scale_q=True,
            lora_targets=("q", "v"),
        )
        model = CLIP(
            spec=spec,
            embed_dim=info["embed_dim"],
            image_size=info["image_size"],
            patch_size=info["patch_size"],
            vision_width=info["vision_width"],
            vision_layers=info["vision_layers"],
            vision_heads=max(info["vision_width"] // 64, 1),
            vocab_size=sd["token_embedding.weight"].shape[0],
            context_length=info["context_length"],
            text_width=info["text_width"],
            text_layers=info["text_layers"],
            text_heads=int(g["theads"]),
            use_flash=False,
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        toks = jnp.asarray(g["toks"])
        params = model.init(jax.random.PRNGKey(0), x, toks)["params"]
        params, missing = graft(params, clip_state_dict_to_tree(sd))
        assert not missing
        fi = model.apply({"params": params}, x,
                         method=CLIP.encode_image)
        ft = model.apply({"params": params}, toks,
                         method=CLIP.encode_text)
        np.testing.assert_allclose(
            np.asarray(fi), g["feats_img"], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(ft), g["feats_txt"], rtol=1e-4, atol=1e-5
        )


class TestVitVariantsRefexec:
    """full_shot PEFT ViT variants executed end-to-end (see
    generate_models_from_reference.gen_vit_variants for what each pins)."""

    def _run(self, fname, spec, conv=False, **model_kw):
        from peft_vit_tpu.models.convert import convvit_state_dict_to_tree
        from peft_vit_tpu.models.vit_conv import ConvViT

        g = np.load(os.path.join(GOLDEN, fname))
        sd = _sd(g)
        width = sd["pos_embed"].shape[-1]
        layers = len(
            {k.split(".")[1] for k in sd if k.startswith("blocks.")}
        )
        patch = sd["patch_embed.proj.weight"].shape[-1]
        use_cls = bool(int(g["use_cls"]))
        n_tok = sd["pos_embed"].shape[1] - (1 if use_cls else 0)
        image = patch * int(np.sqrt(n_tok))
        if conv:
            model = ConvViT(
                image_size=image, patch_size=patch, width=width,
                layers=layers, heads=int(g["heads"]),
                use_cls_token=use_cls, **model_kw,
            )
            flat_src, _ = convvit_state_dict_to_tree(sd)
        else:
            model = VisionTransformer(
                image_size=image, patch_size=patch, width=width,
                layers=layers, heads=int(g["heads"]), style="timm",
                spec=spec, use_cls_token=use_cls, use_flash=False,
                **model_kw,
            )
            flat_src = timm_vit_state_dict_to_tree(sd)
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        params, missing = graft(params, flat_src)
        assert not missing
        feats = model.apply({"params": params}, x, True)
        np.testing.assert_allclose(
            np.asarray(feats), g["feats"], rtol=1e-4, atol=1e-5
        )
        logits = (
            np.asarray(feats) @ sd["head.weight"].T + sd["head.bias"]
        )
        np.testing.assert_allclose(
            logits, g["logits"], rtol=1e-4, atol=1e-5
        )

    def test_vit_lora(self):
        from peft_vit_tpu.peft import PEFTSpec

        self._run(
            "refexec_vit_lora.npz",
            PEFTSpec(
                method="lora", attn_delta="lora", lora_rank=4,
                lora_alpha=128.0, lora_post_scale_q=False,
                lora_targets=("q", "v"),
            ),
        )

    def test_vit_adapter(self):
        # Executed-reference finding: cls_vit_adapter's forward_features
        # ships with a leftover `if id == 0` (":561-565, '### adapterdrop
        # test, need to modify for adapter'") — the adapter EXECUTES only
        # in block 0 even though params exist everywhere.  Matched here
        # with adapter_layers=(0,); our `--method adapter` default keeps
        # the intended every-block semantics (as few_shot adapter_clip
        # does).  Documented in PARITY.md.
        from peft_vit_tpu.peft import PEFTSpec

        self._run(
            "refexec_vit_adapter.npz",
            PEFTSpec(
                method="adapter", adapter="houlsby", adapter_dim=64,
                adapter_act="relu", adapter_layers=(0,),
            ),
        )

    def test_vit_adapterdrop_lora(self):
        # Executed-reference finding: cls_vit_adapterdrop_lora.py defines
        # a LoraAttention class (:59) that is NEVER used — Block wires the
        # plain Attention (:244), so the shipped model is adapter-drop
        # (adapter executes only at id==11, :710-714) with dead LoRA code.
        # Matched here without attn_delta; our `lora_drop_adapter` method
        # additionally implements the evidently intended LoRA+drop combo.
        # Documented in PARITY.md.
        from peft_vit_tpu.peft import PEFTSpec

        self._run(
            "refexec_vit_adapterdrop_lora.npz",
            PEFTSpec(
                method="adapterdrop", adapter="houlsby",
                adapter_dim=64, adapter_act="relu",
                adapter_layers=(11,),
            ),
        )

    def test_vit_rpb(self):
        from peft_vit_tpu.peft import PEFTSpec

        self._run(
            "refexec_vit_rpb.npz",
            PEFTSpec(method="rpb", attn_bias="rpb", rpb_ndim=-1),
        )

    def test_vit_cswin(self):
        self._run(
            "refexec_vit_cswin.npz",
            None,
            conv=True,
            lepe=True,
            ref_qkv_scramble=True,
        )


def _conv(w):
    return np.transpose(w, (2, 3, 1, 0))


class TestRexnetRefexec:
    def test_rexnet_end_to_end(self):
        """Whole ReXNetV1 executed (cls_rexnet.py): exact channel
        schedule, partial-channel residual, BN-carrying SE."""
        from peft_vit_tpu.models.rexnet import ReXNet, _rexnet_channels

        g = np.load(os.path.join(GOLDEN, "refexec_rexnet.npz"))
        sd = _sd(g)
        wm, dm = float(g["wm"]), float(g["dm"])
        cfg = _rexnet_channels(wm, dm)
        depth = len(cfg)

        params, stats = {}, {}

        def put_conv(path, key):
            params[path + "/kernel"] = _conv(sd[key + ".weight"])
            if key + ".bias" in sd:
                params[path + "/bias"] = sd[key + ".bias"]

        def put_bn(path, key):
            params[path + "/scale"] = sd[key + ".weight"]
            params[path + "/bias"] = sd[key + ".bias"]
            stats[path + "/mean"] = sd[key + ".running_mean"]
            stats[path + "/var"] = sd[key + ".running_var"]

        put_conv("stem", "features.0")
        put_bn("stem_bn", "features.1")
        for i, (cin, cout, s, t, se) in enumerate(cfg):
            base = f"features.{3 + i}.out"
            o = f"block{i}"
            j = 0
            if t != 1:
                put_conv(f"{o}/expand", f"{base}.{j}")
                put_bn(f"{o}/bn_expand", f"{base}.{j + 1}")
                j += 3  # conv, bn, swish
            put_conv(f"{o}/dw", f"{base}.{j}")
            put_bn(f"{o}/bn_dw", f"{base}.{j + 1}")
            j += 2
            if se:
                put_conv(f"{o}/se/fc1", f"{base}.{j}.fc.0")
                put_bn(f"{o}/se/bn", f"{base}.{j}.fc.1")
                put_conv(f"{o}/se/fc2", f"{base}.{j}.fc.3")
                j += 1
            j += 1  # ReLU6
            put_conv(f"{o}/project", f"{base}.{j}")
            put_bn(f"{o}/bn_project", f"{base}.{j + 1}")
        put_conv("head_conv", f"features.{3 + depth}")
        put_bn("head_bn", f"features.{4 + depth}")

        from flax import traverse_util

        model = ReXNet(width_mult=wm, depth_mult=dm)
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        vflat = traverse_util.flatten_dict(variables["params"], sep="/")
        assert set(vflat) == set(params), (
            sorted(set(vflat) ^ set(params))[:6]
        )
        for k, v in params.items():
            assert vflat[k].shape == v.shape, (k, vflat[k].shape, v.shape)
        sflat = traverse_util.flatten_dict(
            variables["batch_stats"], sep="/"
        )
        assert set(sflat) == set(stats)
        feats = model.apply(
            {
                "params": traverse_util.unflatten_dict(params, sep="/"),
                "batch_stats": traverse_util.unflatten_dict(
                    stats, sep="/"
                ),
            },
            x,
            True,
        )
        w = sd["output.1.weight"]  # (classes, pen, 1, 1)
        logits = (
            np.asarray(feats) @ w.reshape(w.shape[0], -1).T
            + sd["output.1.bias"]
        )
        np.testing.assert_allclose(
            logits, g["logits"], rtol=1e-4, atol=1e-5
        )


class TestResnetRefexec:
    def test_resnet_end_to_end(self):
        """cls_resnet.py executed: post-act bottleneck, SELayer after bn3,
        avg_down (ResNet-D) shortcut, R50-family geometry at width 16."""
        from peft_vit_tpu.models.resnet import ResNet

        g = np.load(os.path.join(GOLDEN, "refexec_resnet.npz"))
        sd = _sd(g)

        params, stats = {}, {}

        def put_conv(path, key):
            params[path + "/kernel"] = _conv(sd[key + ".weight"])

        def put_bn(path, key):
            params[path + "/scale"] = sd[key + ".weight"]
            params[path + "/bias"] = sd[key + ".bias"]
            stats[path + "/mean"] = sd[key + ".running_mean"]
            stats[path + "/var"] = sd[key + ".running_var"]

        put_conv("conv1", "conv1")
        put_bn("bn1", "bn1")
        for si in (1, 2):
            o = f"layer{si}_block0"
            p = f"layer{si}.0"
            for c in ("conv1", "conv2", "conv3"):
                put_conv(f"{o}/{c}", f"{p}.{c}")
            for b in ("bn1", "bn2", "bn3"):
                put_bn(f"{o}/{b}", f"{p}.{b}")
            # avg_down shortcut: Sequential(AvgPool, Conv, BN)
            put_conv(f"{o}/downsample", f"{p}.downsample.1")
            put_bn(f"{o}/bn_down", f"{p}.downsample.2")
            if f"{p}.se.fc.0.weight" in sd:
                params[f"{o}/se/fc1/kernel"] = sd[f"{p}.se.fc.0.weight"].T
                params[f"{o}/se/fc2/kernel"] = sd[f"{p}.se.fc.2.weight"].T

        from flax import traverse_util

        model = ResNet(
            layers=(1, 1),
            width=16,
            se_ratio=1.0 / 16.0,
            se_stages=(False, True),
            avg_down=True,
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        vflat = traverse_util.flatten_dict(variables["params"], sep="/")
        assert set(vflat) == set(params), (
            sorted(set(vflat) ^ set(params))[:6]
        )
        for k, v in params.items():
            assert vflat[k].shape == v.shape, (k, vflat[k].shape, v.shape)
        feats = model.apply(
            {
                "params": traverse_util.unflatten_dict(params, sep="/"),
                "batch_stats": traverse_util.unflatten_dict(
                    stats, sep="/"
                ),
            },
            x,
            True,
        )
        logits = (
            np.asarray(feats) @ sd["fc.weight"].T + sd["fc.bias"]
        )
        np.testing.assert_allclose(
            logits, g["logits"], rtol=1e-4, atol=1e-5
        )


class TestSwinRefexec:
    def test_swin_end_to_end(self):
        """Official Swin executed whole (cls_swin.py): shifted-window
        attention with the cyclic-shift mask at stage 0 (resolution 8,
        window 4), relative position bias, patch merging, final norm +
        token-mean pooling, via swin_state_dict_to_tree + graft."""
        from peft_vit_tpu.models.convert import swin_state_dict_to_tree
        from peft_vit_tpu.models.swin import SwinTransformer

        g = np.load(os.path.join(GOLDEN, "refexec_swin.npz"))
        sd = _sd(g)
        embed = sd["patch_embed.proj.weight"].shape[0]
        patch = sd["patch_embed.proj.weight"].shape[-1]
        model = SwinTransformer(
            image_size=32,
            patch_size=patch,
            embed_dim=embed,
            depths=tuple(int(d) for d in g["depths"]),
            num_heads=tuple(int(h) for h in g["heads"]),
            window_size=int(g["window"]),
            use_flash=False,
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        params, missing = graft(params, swin_state_dict_to_tree(sd))
        assert not missing
        feats = model.apply({"params": params}, x, True)
        np.testing.assert_allclose(
            np.asarray(feats), g["feats"], rtol=1e-4, atol=1e-5
        )
        logits = (
            np.asarray(feats) @ sd["head.weight"].T + sd["head.bias"]
        )
        np.testing.assert_allclose(
            logits, g["logits"], rtol=1e-4, atol=1e-5
        )


class TestVitConvRefexec:
    def test_vit_conv_end_to_end(self):
        """cls_vit_conv.py executed: attention + MLP + the pw-glu-dw-bn-
        swish-pw conv mixer with ADD_CLS (:199-238), BN running stats
        included; via convvit_state_dict_to_tree."""
        from peft_vit_tpu.models.convert import convvit_state_dict_to_tree
        from peft_vit_tpu.models.vit_conv import ConvViT
        from flax import traverse_util

        g = np.load(os.path.join(GOLDEN, "refexec_vit_conv.npz"))
        sd = _sd(g)
        width = sd["pos_embed"].shape[-1]
        layers = len(
            {k.split(".")[1] for k in sd if k.startswith("blocks.")}
        )
        patch = sd["patch_embed.proj.weight"].shape[-1]
        image = patch * int(np.sqrt(sd["pos_embed"].shape[1] - 1))
        model = ConvViT(
            image_size=image, patch_size=patch, width=width,
            layers=layers, heads=int(g["heads"]), has_conv=True,
            add_cls=True, conv_ratio=1.0,
        )
        flat_src, flat_stats = convvit_state_dict_to_tree(sd)
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        params, missing = graft(variables["params"], flat_src)
        assert not missing
        sflat = traverse_util.flatten_dict(
            variables["batch_stats"], sep="/"
        )
        assert set(sflat) == set(flat_stats)
        stats = traverse_util.unflatten_dict(flat_stats, sep="/")
        feats = model.apply(
            {"params": params, "batch_stats": stats}, x, True
        )
        np.testing.assert_allclose(
            np.asarray(feats), g["feats"], rtol=1e-4, atol=1e-5
        )
        logits = (
            np.asarray(feats) @ sd["head.weight"].T + sd["head.bias"]
        )
        np.testing.assert_allclose(
            logits, g["logits"], rtol=1e-4, atol=1e-5
        )


class TestClipRnRefexec:
    def test_clip_rn_end_to_end(self):
        """ModifiedResNet executed from adapter_model.py (identical to
        model.py:96-160): anti-aliased bottlenecks + AttentionPool2d,
        via clip_rn_state_dict_to_tree (params + BN running stats)."""
        from peft_vit_tpu.models.clip_resnet import ModifiedResNet
        from peft_vit_tpu.models.convert import clip_rn_state_dict_to_tree

        g = np.load(os.path.join(GOLDEN, "refexec_clip_rn.npz"))
        sd = _sd(g)
        flat, stats = clip_rn_state_dict_to_tree(sd)
        m = ModifiedResNet(
            layers=(1, 1, 1, 1),
            output_dim=int(g["embed"]),
            image_size=int(g["image"]),
            width=int(g["width"]),
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = m.init(jax.random.PRNGKey(0), x)
        strip = lambda d: {k[len("visual/"):]: v for k, v in d.items()}
        params, missing = graft(dict(variables["params"]), strip(flat))
        assert not missing
        bstats, _ = graft(dict(variables["batch_stats"]), strip(stats))
        out = m.apply(
            {"params": params, "batch_stats": bstats}, x, True
        )
        np.testing.assert_allclose(
            np.asarray(out), g["out"], rtol=2e-4, atol=1e-4
        )


class TestTransformerProbeRefexec:
    def test_extra_block_forward(self):
        """transformer_classifier.py executed: depth+1 blocks — the
        reference's 13th (appended, trainable-only) block is forward-wise
        one more plain block; pins spec.extra_block."""
        from peft_vit_tpu.peft import PEFTSpec

        g = np.load(os.path.join(GOLDEN, "refexec_transformer_probe.npz"))
        sd = _sd(g)
        width = sd["cls_token"].shape[-1]
        depth = int(g["depth"])
        patch = sd["patch_embed.proj.weight"].shape[-1]
        image = patch * int(np.sqrt(sd["pos_embed"].shape[1] - 1))
        model = VisionTransformer(
            image_size=image,
            patch_size=patch,
            width=width,
            layers=depth,
            heads=int(g["heads"]),
            style="timm",
            spec=PEFTSpec(method="transformer_probe", extra_block=True),
            use_flash=False,
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        params, missing = graft(params, timm_vit_state_dict_to_tree(sd))
        assert not missing
        feats = model.apply({"params": params}, x, True)
        np.testing.assert_allclose(
            np.asarray(feats), g["feats"], rtol=1e-4, atol=1e-5
        )


class TestHrnetRefexec:
    def test_hrnet_end_to_end(self):
        """cls_hrnet.py executed whole at W8 / 3 stages: stem, bottleneck
        layer1, transitions, basic-block branches, the multi-resolution
        fuse layers, and the incre/downsamp/proj head (bias-carrying
        convs); via hrnet_state_dict_to_tree (params + BN stats)."""
        from flax import traverse_util

        from peft_vit_tpu.models.convert import hrnet_state_dict_to_tree
        from peft_vit_tpu.models.hrnet import HRNet

        g = np.load(os.path.join(GOLDEN, "refexec_hrnet.npz"))
        sd = _sd(g)
        flat, fstats = hrnet_state_dict_to_tree(sd)
        model = HRNet(width=int(g["w"]), stage_modules=(1, 1, 1))
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        params, missing = graft(variables["params"], flat)
        assert not missing, missing[:6]
        sflat = traverse_util.flatten_dict(
            variables["batch_stats"], sep="/"
        )
        assert set(sflat) == set(fstats), sorted(
            set(sflat) ^ set(fstats)
        )[:6]
        feats = model.apply(
            {
                "params": params,
                "batch_stats": traverse_util.unflatten_dict(
                    fstats, sep="/"
                ),
            },
            x,
            True,
        )
        logits = (
            np.asarray(feats) @ sd["classifier.weight"].T
            + sd["classifier.bias"]
        )
        np.testing.assert_allclose(
            logits, g["logits"], rtol=2e-4, atol=1e-4
        )


class TestSslSwinRefexec:
    def test_ssl_swin_n_last_blocks(self):
        """ssl_swin.py executed: ape embedding plus the SSL linear-eval
        features — concatenated avg-pooled outputs of the last n blocks,
        final norm applied only to last-stage blocks (:775-814)."""
        from peft_vit_tpu.models.convert import swin_state_dict_to_tree
        from peft_vit_tpu.models.swin import SwinTransformer

        g = np.load(os.path.join(GOLDEN, "refexec_ssl_swin.npz"))
        sd = _sd(g)
        embed = sd["patch_embed.proj.weight"].shape[0]
        model = SwinTransformer(
            image_size=32,
            patch_size=sd["patch_embed.proj.weight"].shape[-1],
            embed_dim=embed,
            depths=tuple(int(d) for d in g["depths"]),
            num_heads=tuple(int(h) for h in g["heads"]),
            window_size=int(g["window"]),
            ape=True,
            use_flash=False,
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        params = model.init(jax.random.PRNGKey(0), x)["params"]
        params, missing = graft(params, swin_state_dict_to_tree(sd))
        assert not missing
        nlast = model.apply(
            {"params": params}, x, True, n_last_blocks=int(g["n_last"])
        )
        np.testing.assert_allclose(
            np.asarray(nlast), g["nlast"], rtol=1e-4, atol=1e-5
        )


class TestResNetDRefexec:
    def test_resnet_d_end_to_end(self):
        """cls_resnetD.py executed whole: deep 3x3 stem without maxpool,
        PreActBottleneck (act0 on the input, downsample fed from act0,
        bn3 AFTER the residual add), DYReLU2 activations at every act
        site including the trailing ``final`` act, SE on stage 2 and
        avg_down shortcuts — all with non-trivial BN running stats."""
        from flax import traverse_util

        from peft_vit_tpu.models.resnet import DyReLUSpec, ResNet

        g = np.load(os.path.join(GOLDEN, "refexec_resnet_d.npz"))
        sd = _sd(g)

        params, stats = {}, {}

        def put_conv(path, key):
            params[path + "/kernel"] = _conv(sd[key + ".weight"])

        def put_bn(path, key):
            params[path + "/scale"] = sd[key + ".weight"]
            params[path + "/bias"] = sd[key + ".bias"]
            stats[path + "/mean"] = sd[key + ".running_mean"]
            stats[path + "/var"] = sd[key + ".running_var"]

        def put_dy(path, key):
            # DYReLU2 head: fc.0 (squeeze) and fc.2 (coefficients)
            params[path + "/fc1/kernel"] = sd[key + ".fc.0.weight"].T
            params[path + "/fc1/bias"] = sd[key + ".fc.0.bias"]
            params[path + "/fc2/kernel"] = sd[key + ".fc.2.weight"].T
            params[path + "/fc2/bias"] = sd[key + ".fc.2.bias"]

        for i in (1, 2, 3):
            put_conv(f"stem_conv{i}", f"conv{i}")
            put_bn(f"stem_bn{i}", f"bn{i}")
        put_dy("stem_act1", "act1")
        put_dy("stem_act2", "act2")
        for si in (1, 2):
            o = f"layer{si}_block0"
            p = f"layer{si}.0"
            put_dy(f"{o}/act0", f"{p}.act0")
            put_dy(f"{o}/act1", f"{p}.act1")
            put_dy(f"{o}/act2", f"{p}.act2")
            for c in ("conv1", "conv2", "conv3"):
                put_conv(f"{o}/{c}", f"{p}.{c}")
            for b in ("bn1", "bn2", "bn3"):
                put_bn(f"{o}/{b}", f"{p}.{b}")
            # avg_down shortcut = Sequential(AvgPool, Conv, BN)
            put_conv(f"{o}/downsample", f"{p}.downsample.1")
            put_bn(f"{o}/bn_down", f"{p}.downsample.2")
            if f"{p}.se.fc.0.weight" in sd:
                params[f"{o}/se/fc1/kernel"] = sd[f"{p}.se.fc.0.weight"].T
                params[f"{o}/se/fc2/kernel"] = sd[f"{p}.se.fc.2.weight"].T
        put_dy("final_act", "final.0")

        model = ResNet(
            layers=(1, 1),
            width=64,
            version="d",
            deep_stem=True,
            avg_down=True,
            se_ratio=1.0 / 16.0,
            se_stages=(False, True),
            dy_relu=DyReLUSpec(),
        )
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        vflat = traverse_util.flatten_dict(variables["params"], sep="/")
        assert set(vflat) == set(params), (
            sorted(set(vflat) ^ set(params))[:8]
        )
        for k, v in params.items():
            assert vflat[k].shape == v.shape, (k, vflat[k].shape, v.shape)
        feats = model.apply(
            {
                "params": traverse_util.unflatten_dict(params, sep="/"),
                "batch_stats": traverse_util.unflatten_dict(
                    stats, sep="/"
                ),
            },
            x,
            True,
        )
        logits = np.asarray(feats) @ sd["fc.weight"].T + sd["fc.bias"]
        np.testing.assert_allclose(
            logits, g["logits"], rtol=1e-4, atol=1e-5
        )


class TestHRNetVRefexec:
    """cls_hrnet_v2 / v2_share / v3 / v4 executed whole (tiny geometry)
    -> hrnet_v_state_dict_to_tree -> HRNetV; external classifier."""

    def _run(self, fname, version, **kw):
        from flax import traverse_util

        from peft_vit_tpu.models.convert import hrnet_v_state_dict_to_tree
        from peft_vit_tpu.models.hrnet import HRNetV

        g = np.load(os.path.join(GOLDEN, fname))
        sd = _sd(g)
        spec = dict(
            num_modules=(1, 1, 1),
            num_branches=(2, 3, 4),
            num_blocks=((2, 2), (2, 2, 2), (2, 2, 2, 2)),
            with_se=True,
        )
        spec.update(kw)
        flat, fstats = hrnet_v_state_dict_to_tree(
            sd,
            version,
            stem_spec=spec.get("stem_spec", ""),
            num_modules=spec["num_modules"],
            num_branches=spec["num_branches"],
            num_blocks=spec["num_blocks"],
            num_channels=spec["num_channels"],
            block=spec["block"],
            head_block=spec["head_block"],
            head_proj=spec["head_proj"],
        )
        model = HRNetV(version=version, **spec)
        x = jnp.asarray(g["x"]).transpose(0, 2, 3, 1)
        variables = model.init(jax.random.PRNGKey(0), x)
        params, missing = graft(variables["params"], flat)
        assert not missing, missing[:6]
        sflat = traverse_util.flatten_dict(
            variables["batch_stats"], sep="/"
        )
        assert set(sflat) == set(fstats), sorted(
            set(sflat) ^ set(fstats)
        )[:6]
        feats = model.apply(
            {
                "params": params,
                "batch_stats": traverse_util.unflatten_dict(
                    fstats, sep="/"
                ),
            },
            x,
            True,
        )
        logits = (
            np.asarray(feats) @ sd["classifier.weight"].T
            + sd["classifier.bias"]
        )
        np.testing.assert_allclose(
            logits, g["logits"], rtol=2e-4, atol=1e-4
        )

    def test_v2_end_to_end(self):
        """v2: SE-bottleneck stem, own-resolution transitions, last-block
        relu drop, chained fuse, with_relu=False BOTTLENECK incre head."""
        self._run(
            "refexec_hrnet_v2.npz", "v2",
            num_channels=((8, 16), (9, 18, 36), (10, 20, 40, 80)),
            block=("BASIC",) * 3,
            head_block=("BOTTLENECK",) * 4,
            head_channels=(8, 16, 32, 64),
            head_proj=128,
        )

    def test_v2_share_end_to_end(self):
        """v2_share: branch stacks weight-shared across resolutions via
        cumulative channel splits (cls_hrnet_v2_share.py:302-310)."""
        self._run(
            "refexec_hrnet_v2_share.npz", "v2_share",
            num_channels=((8, 16), (8, 16, 32), (8, 16, 32, 64)),
            block=("BASIC",) * 3,
            head_block=("BOTTLENECK",) * 4,
            head_channels=(8, 16, 32, 64),
            head_proj=128,
        )

    def test_v3_end_to_end(self):
        """v3: inverted-residual branches (bias convs, SE/4), last-branch
        transitions, INVERTED head."""
        self._run(
            "refexec_hrnet_v3.npz", "v3",
            num_channels=((8, 16), (8, 16, 32), (8, 16, 32, 64)),
            block=("INVERTED",) * 3,
            head_block=("INVERTED",) * 4,
            head_channels=(16, 32, 64, 128),
            head_proj=256,
        )

    def test_v4_end_to_end(self):
        """v4 at the flagship conv32s2maxpools2inv32e6x1 stem."""
        self._run(
            "refexec_hrnet_v4.npz", "v4",
            stem_spec="conv32s2maxpools2inv32e6x1",
            num_channels=((8, 16), (8, 16, 32), (8, 16, 32, 64)),
            block=("INVERTED",) * 3,
            head_block=("INVERTED",) * 4,
            head_channels=(16, 32, 64, 128),
            head_proj=256,
        )

    def test_v4_wose_stem_end_to_end(self):
        """The 'wose' stem whose SE is actually ON (cls_hrnet_v4.py:482
        omits with_se=False — constructor default wins)."""
        self._run(
            "refexec_hrnet_v4_wose.npz", "v4",
            stem_spec="conv32s2maxpools2inv32e2wosex1",
            num_channels=((8, 16), (8, 16, 32), (8, 16, 32, 64)),
            block=("INVERTED",) * 3,
            head_block=("INVERTED",) * 4,
            head_channels=(16, 32, 64, 128),
            head_proj=256,
        )

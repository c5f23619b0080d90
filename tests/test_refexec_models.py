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

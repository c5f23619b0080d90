"""Checkpoint conversion + torch numerical parity tests.

Golden values come from *torch built-ins* (nn.MultiheadAttention,
nn.LayerNorm) — the same modules the reference CLIP is assembled from — so
these tests pin our attention/LN math to the reference's numerics without
reimplementing reference code.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import traverse_util

torch = pytest.importorskip("torch")

from peft_vit_tpu.models import CLIP, VisionTransformer
from peft_vit_tpu.models.convert import (
    clip_state_dict_to_tree,
    graft,
    infer_clip_shape,
    timm_vit_state_dict_to_tree,
)
from peft_vit_tpu.models.layers import LayerNorm, MultiHeadAttention
from peft_vit_tpu.peft import PEFTSpec


def synth_clip_sd(
    width=64, layers=2, patch=8, image=32, embed=32, twidth=32,
    tlayers=2, vocab=100, ctx=16, seed=0,
):
    """Random state dict in OpenAI CLIP naming."""
    g = torch.Generator().manual_seed(seed)
    r = lambda *s: torch.randn(*s, generator=g) * 0.02
    sd = {
        "visual.conv1.weight": r(width, 3, patch, patch),
        "visual.class_embedding": r(width),
        "visual.positional_embedding": r((image // patch) ** 2 + 1, width),
        "visual.ln_pre.weight": torch.ones(width),
        "visual.ln_pre.bias": torch.zeros(width),
        "visual.ln_post.weight": torch.ones(width),
        "visual.ln_post.bias": torch.zeros(width),
        "visual.proj": r(width, embed),
        "token_embedding.weight": r(vocab, twidth),
        "positional_embedding": r(ctx, twidth),
        "ln_final.weight": torch.ones(twidth),
        "ln_final.bias": torch.zeros(twidth),
        "text_projection": r(twidth, embed),
        "logit_scale": torch.tensor(2.659),
    }

    def block(prefix, w):
        sd.update(
            {
                f"{prefix}.ln_1.weight": torch.ones(w),
                f"{prefix}.ln_1.bias": torch.zeros(w),
                f"{prefix}.ln_2.weight": torch.ones(w),
                f"{prefix}.ln_2.bias": torch.zeros(w),
                f"{prefix}.attn.in_proj_weight": r(3 * w, w),
                f"{prefix}.attn.in_proj_bias": r(3 * w),
                f"{prefix}.attn.out_proj.weight": r(w, w),
                f"{prefix}.attn.out_proj.bias": r(w),
                f"{prefix}.mlp.c_fc.weight": r(4 * w, w),
                f"{prefix}.mlp.c_fc.bias": r(4 * w),
                f"{prefix}.mlp.c_proj.weight": r(w, 4 * w),
                f"{prefix}.mlp.c_proj.bias": r(w),
            }
        )

    for i in range(layers):
        block(f"visual.transformer.resblocks.{i}", width)
    for i in range(tlayers):
        block(f"transformer.resblocks.{i}", twidth)
    return sd


class TestShapeInference:
    def test_infer(self):
        sd = synth_clip_sd()
        info = infer_clip_shape(sd)
        assert info["vision_width"] == 64
        assert info["vision_layers"] == 2
        assert info["patch_size"] == 8
        assert info["image_size"] == 32
        assert info["embed_dim"] == 32
        assert info["text_layers"] == 2
        assert info["context_length"] == 16


class TestGraft:
    def test_clip_roundtrip(self):
        sd = synth_clip_sd()
        info = infer_clip_shape(sd)
        model = CLIP(
            embed_dim=info["embed_dim"],
            image_size=info["image_size"],
            patch_size=info["patch_size"],
            vision_width=info["vision_width"],
            vision_layers=info["vision_layers"],
            vision_heads=4,
            vocab_size=100,
            context_length=info["context_length"],
            text_width=info["text_width"],
            text_layers=info["text_layers"],
            text_heads=4,
            use_flash=False,
        )
        x = jnp.zeros((2, 32, 32, 3))
        toks = jnp.ones((2, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, toks)["params"]
        flat_src = clip_state_dict_to_tree(sd)
        params2, missing = graft(params, flat_src)
        assert not missing  # plain CLIP: every leaf comes from the ckpt
        li, lt = model.apply({"params": params2}, x, toks)
        assert li.shape == (2, 2)
        assert np.isfinite(np.asarray(li)).all()

    def test_graft_keeps_fresh_peft_leaves(self):
        sd = synth_clip_sd()
        spec = PEFTSpec(method="lora", attn_delta="lora", lora_rank=2)
        model = CLIP(
            embed_dim=32,
            image_size=32,
            patch_size=8,
            vision_width=64,
            vision_layers=2,
            vision_heads=4,
            vocab_size=100,
            context_length=16,
            text_width=32,
            text_layers=2,
            text_heads=4,
            spec=spec,
            use_flash=False,
        )
        x = jnp.zeros((1, 32, 32, 3))
        toks = jnp.ones((1, 16), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, toks)["params"]
        params2, missing = graft(params, clip_state_dict_to_tree(sd))
        assert all("adapter" in m for m in missing)


class TestTorchParity:
    def test_mha_matches_torch(self):
        """Our packed-qkv attention == torch.nn.MultiheadAttention given
        the same weights (the reference CLIP's attention layer)."""
        w, h, n, b = 32, 4, 10, 2
        tm = torch.nn.MultiheadAttention(w, h, batch_first=True)
        x_t = torch.randn(b, n, w)
        with torch.no_grad():
            ref, _ = tm(x_t, x_t, x_t, need_weights=False)

        ours = MultiHeadAttention(w, h, use_flash=False)
        x_j = jnp.asarray(x_t.numpy())
        params = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        flat = traverse_util.flatten_dict(params, sep="/")
        flat["in_proj/kernel"] = jnp.asarray(
            tm.in_proj_weight.detach().numpy().T
        )
        flat["in_proj/bias"] = jnp.asarray(
            tm.in_proj_bias.detach().numpy()
        )
        flat["out_proj/kernel"] = jnp.asarray(
            tm.out_proj.weight.detach().numpy().T
        )
        flat["out_proj/bias"] = jnp.asarray(
            tm.out_proj.bias.detach().numpy()
        )
        params = traverse_util.unflatten_dict(flat, sep="/")
        out = ours.apply({"params": params}, x_j)
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), atol=2e-5
        )

    def test_layernorm_matches_torch(self):
        w = 16
        tl = torch.nn.LayerNorm(w)
        with torch.no_grad():
            tl.weight.mul_(1.3)
            tl.bias.add_(0.1)
        x_t = torch.randn(4, w)
        ref = tl(x_t).detach().numpy()

        ln = LayerNorm()
        x_j = jnp.asarray(x_t.numpy())
        params = {
            "scale": jnp.asarray(tl.weight.detach().numpy()),
            "bias": jnp.asarray(tl.bias.detach().numpy()),
        }
        out = ln.apply({"params": params}, x_j)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    def test_quick_gelu(self):
        from peft_vit_tpu.models.layers import quick_gelu

        x_t = torch.linspace(-3, 3, 50)
        ref = (x_t * torch.sigmoid(1.702 * x_t)).numpy()
        out = quick_gelu(jnp.asarray(x_t.numpy()))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


class TestTimmConvert:
    def test_timm_format(self):
        w, layers, patch, image = 32, 2, 8, 16
        g = torch.Generator().manual_seed(0)
        r = lambda *s: torch.randn(*s, generator=g) * 0.02
        sd = {
            "patch_embed.proj.weight": r(w, 3, patch, patch),
            "patch_embed.proj.bias": r(w),
            "cls_token": r(1, 1, w),
            "pos_embed": r(1, (image // patch) ** 2 + 1, w),
            "norm.weight": torch.ones(w),
            "norm.bias": torch.zeros(w),
        }
        for i in range(layers):
            p = f"blocks.{i}"
            sd.update(
                {
                    f"{p}.norm1.weight": torch.ones(w),
                    f"{p}.norm1.bias": torch.zeros(w),
                    f"{p}.norm2.weight": torch.ones(w),
                    f"{p}.norm2.bias": torch.zeros(w),
                    f"{p}.attn.qkv.weight": r(3 * w, w),
                    f"{p}.attn.qkv.bias": r(3 * w),
                    f"{p}.attn.proj.weight": r(w, w),
                    f"{p}.attn.proj.bias": r(w),
                    f"{p}.mlp.fc1.weight": r(4 * w, w),
                    f"{p}.mlp.fc1.bias": r(4 * w),
                    f"{p}.mlp.fc2.weight": r(w, 4 * w),
                    f"{p}.mlp.fc2.bias": r(w),
                }
            )
        vit = VisionTransformer(
            image_size=image,
            patch_size=patch,
            width=w,
            layers=layers,
            heads=4,
            style="timm",
            use_flash=False,
        )
        x = jnp.zeros((1, image, image, 3))
        params = vit.init(jax.random.PRNGKey(0), x)["params"]
        params2, missing = graft(
            params, timm_vit_state_dict_to_tree(sd)
        )
        assert not missing
        out = vit.apply({"params": params2}, x)
        assert out.shape == (1, w)


def test_load_torch_checkpoint_model_key(tmp_path):
    """TEST.MODEL_KEY unwraps nested checkpoints (the reference SSL-eval
    yamls store the tower under 'teacher', tools/finetune.py:213-214)."""
    import torch

    from peft_vit_tpu.models.convert import load_torch_checkpoint

    inner = {"w": torch.ones(2, 2)}
    p = tmp_path / "ck.pth"
    torch.save({"teacher": inner, "epoch": 3}, p)
    sd = load_torch_checkpoint(str(p), model_key="teacher")
    assert set(sd) == {"w"}
    # without the key the nested dict comes back whole
    sd2 = load_torch_checkpoint(str(p))
    assert "teacher" in sd2

"""End-to-end logit parity: converted torch CLIP visual tower vs ours.

SURVEY §4 requires golden-value tests against reference PyTorch logits.
No pretrained weights are downloadable here, so the golden model is a
randomly-initialized CLIP-architecture visual tower assembled from *torch
built-ins* (nn.MultiheadAttention / nn.LayerNorm / nn.Linear + QuickGELU),
exported in OpenAI state-dict naming, converted by models.convert, and
compared logit-for-logit.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
from torch import nn

from peft_vit_tpu.models import VisionTransformer
from peft_vit_tpu.models.convert import clip_state_dict_to_tree, graft
from peft_vit_tpu.peft import PEFTSpec


class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _Block(nn.Module):
    """Pre-LN transformer block from torch builtins (CLIP architecture)."""

    def __init__(self, d, h):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, h)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential(
            nn.Linear(d, 4 * d), _QuickGELU(), nn.Linear(4 * d, d)
        )
        self.ln_2 = nn.LayerNorm(d)

    def forward(self, x):  # x: (N, B, D) seq-first
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False)[0]
        return x + self.mlp(self.ln_2(x))


class _TorchVisual(nn.Module):
    def __init__(self, image=32, patch=8, width=64, layers=2, heads=4,
                 embed=32):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
        scale = width**-0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        n = (image // patch) ** 2 + 1
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(n, width)
        )
        self.ln_pre = nn.LayerNorm(width)
        self.blocks = nn.ModuleList(
            [_Block(width, heads) for _ in range(layers)]
        )
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, embed))

    def forward(self, x):  # x: (B, 3, H, W)
        x = self.conv1(x)
        b, c, gh, gw = x.shape
        x = x.reshape(b, c, gh * gw).permute(0, 2, 1)
        cls = self.class_embedding.expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)  # NLD -> LND (torch MHA is seq-first)
        for blk in self.blocks:
            x = blk(x)
        x = x.permute(1, 0, 2)
        return self.ln_post(x[:, 0, :]) @ self.proj

    def openai_state_dict(self):
        """Rename to the OpenAI CLIP checkpoint layout."""
        sd = {}
        sd["visual.conv1.weight"] = self.conv1.weight
        sd["visual.class_embedding"] = self.class_embedding
        sd["visual.positional_embedding"] = self.positional_embedding
        sd["visual.ln_pre.weight"] = self.ln_pre.weight
        sd["visual.ln_pre.bias"] = self.ln_pre.bias
        for i, blk in enumerate(self.blocks):
            p = f"visual.transformer.resblocks.{i}"
            sd[f"{p}.attn.in_proj_weight"] = blk.attn.in_proj_weight
            sd[f"{p}.attn.in_proj_bias"] = blk.attn.in_proj_bias
            sd[f"{p}.attn.out_proj.weight"] = blk.attn.out_proj.weight
            sd[f"{p}.attn.out_proj.bias"] = blk.attn.out_proj.bias
            sd[f"{p}.ln_1.weight"] = blk.ln_1.weight
            sd[f"{p}.ln_1.bias"] = blk.ln_1.bias
            sd[f"{p}.mlp.c_fc.weight"] = blk.mlp[0].weight
            sd[f"{p}.mlp.c_fc.bias"] = blk.mlp[0].bias
            sd[f"{p}.mlp.c_proj.weight"] = blk.mlp[2].weight
            sd[f"{p}.mlp.c_proj.bias"] = blk.mlp[2].bias
            sd[f"{p}.ln_2.weight"] = blk.ln_2.weight
            sd[f"{p}.ln_2.bias"] = blk.ln_2.bias
        sd["visual.ln_post.weight"] = self.ln_post.weight
        sd["visual.ln_post.bias"] = self.ln_post.bias
        sd["visual.proj"] = self.proj
        return {k: v.detach() for k, v in sd.items()}


class TestVisualTowerParity:
    def test_logits_match(self):
        torch.manual_seed(0)
        tm = _TorchVisual().eval()
        x_t = torch.randn(3, 3, 32, 32)
        with torch.no_grad():
            golden = tm(x_t).numpy()

        ours = VisionTransformer(
            image_size=32,
            patch_size=8,
            width=64,
            layers=2,
            heads=4,
            style="clip",
            output_dim=32,
            spec=PEFTSpec(),
            use_flash=False,
        )
        x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))  # NCHW->NHWC
        params = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        flat = clip_state_dict_to_tree(tm.openai_state_dict())
        visual = {
            k[len("visual/"):]: v
            for k, v in flat.items()
            if k.startswith("visual/")
        }
        params, missing = graft(params, visual)
        assert not missing
        out = ours.apply({"params": params}, x_j)
        np.testing.assert_allclose(
            np.asarray(out), golden, atol=2e-5, rtol=1e-4
        )

    def test_parity_survives_inert_lora(self):
        """Zero-init LoRA on top of grafted weights keeps parity."""
        torch.manual_seed(1)
        tm = _TorchVisual().eval()
        x_t = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            golden = tm(x_t).numpy()
        spec = PEFTSpec(
            method="lora",
            attn_delta="lora",
            lora_rank=4,
            lora_post_scale_q=True,
        )
        ours = VisionTransformer(
            image_size=32,
            patch_size=8,
            width=64,
            layers=2,
            heads=4,
            style="clip",
            output_dim=32,
            spec=spec,
            use_flash=False,
        )
        x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
        params = ours.init(jax.random.PRNGKey(0), x_j)["params"]
        flat = clip_state_dict_to_tree(tm.openai_state_dict())
        visual = {
            k[len("visual/"):]: v
            for k, v in flat.items()
            if k.startswith("visual/")
        }
        params, missing = graft(params, visual, strict=False)
        assert all("adapter" in m for m in missing)
        out = ours.apply({"params": params}, x_j)
        np.testing.assert_allclose(
            np.asarray(out), golden, atol=2e-5, rtol=1e-4
        )

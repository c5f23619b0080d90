"""CLIP = visual tower + text tower + logit scale.

Reference: evaluation/model.py ``CLIP`` (built by state-dict shape inference
in clip_load.py:95-481 / adapter_model.py:553-594).  Here the architecture
comes from config (MODEL.SPEC), and ``models.convert`` maps an OpenAI-format
torch state dict onto this pytree.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..peft.spec import PEFTSpec
from .text import TextTransformer
from .vit import VisionTransformer

Dtype = Any


class CLIP(nn.Module):
    embed_dim: int = 512
    # vision
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    # behavior
    spec: PEFTSpec = PEFTSpec()
    use_flash: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.visual = VisionTransformer(
            image_size=self.image_size,
            patch_size=self.patch_size,
            width=self.vision_width,
            layers=self.vision_layers,
            heads=self.vision_heads,
            style="clip",
            output_dim=self.embed_dim,
            spec=self.spec,
            use_flash=self.use_flash,
            remat=self.remat,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        self.text = TextTransformer(
            vocab_size=self.vocab_size,
            context_length=self.context_length,
            width=self.text_width,
            layers=self.text_layers,
            heads=self.text_heads,
            output_dim=self.embed_dim,
            use_flash=self.use_flash,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        # CLIP init: ln(1/0.07)
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape, dtype: jnp.full(
                shape, np.log(1.0 / 0.07), dtype
            ),
            (),
            self.param_dtype,
        )

    def encode_image(
        self, image: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        return self.visual(image, deterministic)

    def encode_text(self, tokens: jax.Array) -> jax.Array:
        return self.text(tokens)

    def __call__(
        self,
        image: jax.Array,
        tokens: jax.Array,
        deterministic: bool = True,
        normalize: bool = True,
    ):
        img = self.encode_image(image, deterministic)
        txt = self.encode_text(tokens)
        if normalize:
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale.astype(jnp.float32))
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def clip_from_config(cfg, spec: Optional[PEFTSpec] = None, **overrides):
    """Build a CLIP module from a reference-style MODEL.SPEC config group."""
    s = cfg.MODEL.SPEC
    vision = s.VISION
    text = s.TEXT
    dtype = (
        jnp.bfloat16
        if str(cfg.TPU.COMPUTE_DTYPE) == "bfloat16"
        else jnp.float32
    )
    kw = dict(
        embed_dim=int(s.EMBED_DIM),
        image_size=int(cfg.TRAIN.IMAGE_SIZE[0]),
        patch_size=int(vision.PATCH_SIZE),
        vision_width=int(vision.WIDTH),
        vision_layers=int(vision.LAYERS),
        vision_heads=int(vision.HEADS),
        vocab_size=int(text.VOCAB_SIZE),
        context_length=int(text.CONTEXT_LENGTH),
        text_width=int(text.WIDTH),
        text_layers=int(text.LAYERS),
        text_heads=int(text.HEADS),
        spec=spec or PEFTSpec(),
        use_flash=bool(cfg.TPU.FLASH_ATTENTION),
        remat=bool(cfg.TPU.REMAT),
        dtype=dtype,
    )
    kw.update(overrides)
    return CLIP(**kw)

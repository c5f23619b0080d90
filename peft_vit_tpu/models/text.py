"""CLIP text transformer.

Reference: the text tower inside evaluation/model.py / adapter_model.py
(token_embedding, positional_embedding, causal-masked ResidualAttentionBlocks
with QuickGELU, ln_final, text_projection; features taken at the argmax
token = EOT).  In the PEFT paths the text tower is frozen
(full_model_finetune.py:80-93); it exists here for zero-shot evaluation and
head-initialization-from-text (TRAIN.INIT_HEAD_WITH_TEXT_ENCODER).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..peft.spec import PEFTSpec
from .layers import Block, LayerNorm

Dtype = Any


class TextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    use_flash: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        """tokens: (B, context_length) int32 -> (B, output_dim)."""
        b, n = tokens.shape
        w = self.width

        x = nn.Embed(
            self.vocab_size,
            w,
            name="token_embedding",
            embedding_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, w),
            self.param_dtype,
        )
        x = x + pos[:n].astype(self.dtype)[None]

        for i in range(self.layers):
            x = Block(
                w,
                self.heads,
                act="quick_gelu",
                spec=PEFTSpec(),
                layer_idx=i,
                causal=True,
                use_flash=self.use_flash,
                name=f"blocks_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)

        x = LayerNorm(name="ln_final", param_dtype=self.param_dtype)(x)
        # features at the EOT token (highest token id), CLIP convention
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eot]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(stddev=w**-0.5),
            (w, self.output_dim),
            self.param_dtype,
        )
        return pooled @ proj.astype(self.dtype)

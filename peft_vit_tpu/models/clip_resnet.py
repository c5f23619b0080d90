"""CLIP's ModifiedResNet visual tower (RN50 / RN101 / RN50x4 / RN50x16).

Reference: evaluation/model.py:13-160 (``Bottleneck``, ``AttentionPool2d``,
``ModifiedResNet``).  Differences from a torchvision ResNet, reproduced
here:

* a 3-conv stem (stride-2 3x3, two 3x3) with an avgpool instead of maxpool;
* anti-aliasing strided convolutions — every stride>1 bottleneck performs
  the stride as an avgpool AFTER conv2, and the downsample shortcut is an
  avgpool followed by a stride-1 1x1 conv;
* the final pooling is a single-query QKV attention over the spatial grid
  plus a prepended mean token (``AttentionPool2d``), not a global avgpool.

TPU-native notes: NHWC layout throughout (MXU-friendly convs, no NCHW
permutes), BatchNorm carries a ``batch_stats`` collection exactly like
``models/resnet.py``, and the attention pool computes only the mean-token
query row — mathematically identical to the reference's full (HW+1)
self-attention followed by ``x[0]`` (model.py:70-95), at 1/(HW+1) of the
score FLOPs.

Param names mirror the OpenAI checkpoint layout (conv1/bn1..conv3/bn3,
layer1..layer4, downsample 0/1, attnpool q/k/v/c_proj + positional
embedding) so ``models/convert.clip_rn_state_dict_to_tree`` is a pure
rename.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def _bn(name: str, train: bool, dtype):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        name=name,
        dtype=dtype,
    )


def _avgpool(x: jax.Array, k: int) -> jax.Array:
    """nn.AvgPool2d(k): non-overlapping k x k mean over NHWC."""
    return nn.avg_pool(x, (k, k), strides=(k, k))


class ClipBottleneck(nn.Module):
    """model.py:13-56: all convs stride 1; stride>1 is an avgpool after
    conv2, and the shortcut is avgpool -> 1x1 conv -> bn."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out_ch = self.planes * self.expansion
        h = nn.Conv(
            self.planes, (1, 1), use_bias=False, name="conv1",
            dtype=self.dtype,
        )(x)
        h = nn.relu(_bn("bn1", train, self.dtype)(h))
        h = nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False, name="conv2",
            dtype=self.dtype,
        )(h)
        h = nn.relu(_bn("bn2", train, self.dtype)(h))
        if self.stride > 1:
            h = _avgpool(h, self.stride)
        h = nn.Conv(
            out_ch, (1, 1), use_bias=False, name="conv3",
            dtype=self.dtype,
        )(h)
        h = _bn("bn3", train, self.dtype)(h)

        identity = x
        if self.stride > 1 or x.shape[-1] != out_ch:
            identity = x if self.stride == 1 else _avgpool(x, self.stride)
            identity = nn.Conv(
                out_ch, (1, 1), use_bias=False, name="downsample_conv",
                dtype=self.dtype,
            )(identity)
            identity = _bn("downsample_bn", train, self.dtype)(identity)
        return nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """model.py:59-95: mean token prepended to the HW grid, learned
    positional embedding, one multi-head attention read out at the mean
    token.  Only the mean-token query row is computed (see module doc)."""

    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, gh, gw, c = x.shape
        n = gh * gw
        tokens = x.reshape(b, n, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, N+1, C)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=1.0 / c**0.5),
            (n + 1, c),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)

        h = self.num_heads
        hd = c // h
        dense = lambda d, nm: nn.Dense(d, name=nm, dtype=self.dtype)
        q = dense(c, "q_proj")(tokens[:, :1])  # mean-token query only
        k = dense(c, "k_proj")(tokens)
        v = dense(c, "v_proj")(tokens)
        q = q.reshape(b, 1, h, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, n + 1, h, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, n + 1, h, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * hd**-0.5
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, c)
        return nn.Dense(self.output_dim, name="c_proj", dtype=self.dtype)(
            out
        )


class ModifiedResNet(nn.Module):
    """The CLIP RN visual tower (model.py:96-160).

    ``heads`` follows the OpenAI convention ``width * 32 // 64`` when 0.
    Returns the attention-pooled (B, output_dim) embedding.
    """

    layers: Sequence[int] = (3, 4, 6, 3)  # RN50
    output_dim: int = 1024
    heads: int = 0
    image_size: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        train = not deterministic
        w = self.width
        x = x.astype(self.dtype)

        # 3-conv stem + avgpool (model.py:107-117)
        x = nn.Conv(
            w // 2, (3, 3), strides=2, padding=1, use_bias=False,
            name="conv1", dtype=self.dtype,
        )(x)
        x = nn.relu(_bn("bn1", train, self.dtype)(x))
        x = nn.Conv(
            w // 2, (3, 3), padding=1, use_bias=False, name="conv2",
            dtype=self.dtype,
        )(x)
        x = nn.relu(_bn("bn2", train, self.dtype)(x))
        x = nn.Conv(
            w, (3, 3), padding=1, use_bias=False, name="conv3",
            dtype=self.dtype,
        )(x)
        x = nn.relu(_bn("bn3", train, self.dtype)(x))
        x = _avgpool(x, 2)

        for stage, blocks in enumerate(self.layers):
            planes = w * 2**stage
            for i in range(blocks):
                x = ClipBottleneck(
                    planes,
                    stride=2 if (stage > 0 and i == 0) else 1,
                    name=f"layer{stage + 1}_{i}",
                    dtype=self.dtype,
                )(x, train)

        heads = self.heads or (w * 32 // 64)
        return AttentionPool2d(
            embed_dim=w * 32,
            num_heads=heads,
            output_dim=self.output_dim,
            name="attnpool",
            dtype=self.dtype,
        )(x)

"""EfficientNet (B0-B7 by compound scaling), timm-layout, NHWC.

The reference evaluates ``efficientnet_b0`` as a linear/zero-shot probe
backbone via ``timm.create_model`` + an ``EvalModel`` wrapper that
returns pooled features (evaluation/feature.py:227-231,
resources/model/efficientnet_b0.yaml).  This is a TPU-native rebuild of
timm's plain (non-``tf_``) EfficientNet:

* stem 3x3 s2 -> 7 MBConv stages -> 1x1 head conv -> global avgpool;
* stage 0 is the depthwise-separable block (no expansion, pointwise
  projection ``conv_pw``); later stages are inverted residuals
  (``conv_pw`` expand -> ``conv_dw`` -> SE -> ``conv_pwl`` project);
* squeeze-excitation reduces to ``round(block_input * 0.25)`` channels
  (timm convention: ratio of the block INPUT, not the expanded width);
* SiLU activations, BatchNorm eps 1e-3, symmetric k//2 conv padding
  (timm pad_type='' — NOT TensorFlow SAME).

Param names mirror timm's state dict (conv_stem, bn1, blocks.{s}.{i}.*,
conv_head, bn2) so ``models/convert.timm_effnet_state_dict_to_tree`` is
a pure rename; the classifier is dropped — features feed our
``ClassifierHead`` like every other backbone.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# (expand, channels, repeats, kernel, stride) — the B0 table
B0_BLOCKS: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 3, 1),
    (6, 24, 2, 3, 2),
    (6, 40, 2, 5, 2),
    (6, 80, 3, 3, 2),
    (6, 112, 3, 5, 1),
    (6, 192, 4, 5, 2),
    (6, 320, 1, 3, 1),
)


def round_channels(ch: float, mult: float, divisor: int = 8) -> int:
    """timm round_channels: scale then round to the divisor, never
    dropping more than 10%."""
    ch *= mult
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return int(new)


def _bn(name: str, train: bool, dtype):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-3,
        name=name,
        dtype=dtype,
    )


class SqueezeExcite(nn.Module):
    """se.conv_reduce -> silu -> se.conv_expand -> sigmoid gate."""

    reduced: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.reduced, (1, 1), name="conv_reduce", dtype=self.dtype
        )(s)
        s = nn.silu(s)
        s = nn.Conv(
            x.shape[-1], (1, 1), name="conv_expand", dtype=self.dtype
        )(s)
        return x * nn.sigmoid(s)


class DsConv(nn.Module):
    """Stage-0 depthwise-separable block (timm DepthwiseSeparableConv):
    conv_dw -> bn1 -> silu -> SE -> conv_pw -> bn2 (no expansion)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    se_reduced: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        p = self.kernel // 2
        h = nn.Conv(
            in_ch,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=[(p, p), (p, p)],
            feature_group_count=in_ch,
            use_bias=False,
            name="conv_dw",
            dtype=self.dtype,
        )(x)
        h = nn.silu(_bn("bn1", train, self.dtype)(h))
        h = SqueezeExcite(self.se_reduced, name="se", dtype=self.dtype)(h)
        h = nn.Conv(
            self.out_ch, (1, 1), use_bias=False, name="conv_pw",
            dtype=self.dtype,
        )(h)
        h = _bn("bn2", train, self.dtype)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class MBConv(nn.Module):
    """Inverted residual (timm InvertedResidual): conv_pw expand -> bn1
    -> silu -> conv_dw -> bn2 -> silu -> SE -> conv_pwl -> bn3."""

    out_ch: int
    expand: int = 6
    kernel: int = 3
    stride: int = 1
    se_reduced: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        p = self.kernel // 2
        h = nn.Conv(
            mid, (1, 1), use_bias=False, name="conv_pw", dtype=self.dtype
        )(x)
        h = nn.silu(_bn("bn1", train, self.dtype)(h))
        h = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=[(p, p), (p, p)],
            feature_group_count=mid,
            use_bias=False,
            name="conv_dw",
            dtype=self.dtype,
        )(h)
        h = nn.silu(_bn("bn2", train, self.dtype)(h))
        h = SqueezeExcite(self.se_reduced, name="se", dtype=self.dtype)(h)
        h = nn.Conv(
            self.out_ch, (1, 1), use_bias=False, name="conv_pwl",
            dtype=self.dtype,
        )(h)
        h = _bn("bn3", train, self.dtype)(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNet(nn.Module):
    """Returns the (B, head_ch) pooled feature (EvalModel semantics)."""

    width_mult: float = 1.0
    depth_mult: float = 1.0
    blocks: Sequence[Tuple[int, int, int, int, int]] = B0_BLOCKS
    stem_ch: int = 32
    head_ch: int = 1280
    se_ratio: float = 0.25
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        train = not deterministic
        x = x.astype(self.dtype)
        stem = round_channels(self.stem_ch, self.width_mult)
        x = nn.Conv(
            stem, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
            use_bias=False, name="conv_stem", dtype=self.dtype,
        )(x)
        x = nn.silu(_bn("bn1", train, self.dtype)(x))

        for s, (t, c, n, k, stride) in enumerate(self.blocks):
            out_ch = round_channels(c, self.width_mult)
            repeats = int(math.ceil(n * self.depth_mult))
            for i in range(repeats):
                st = stride if i == 0 else 1
                in_ch = x.shape[-1]
                se_red = max(1, int(in_ch * self.se_ratio))
                if t == 1:
                    x = DsConv(
                        out_ch, kernel=k, stride=st, se_reduced=se_red,
                        name=f"blocks_{s}_{i}", dtype=self.dtype,
                    )(x, train)
                else:
                    x = MBConv(
                        out_ch, expand=t, kernel=k, stride=st,
                        se_reduced=se_red,
                        name=f"blocks_{s}_{i}", dtype=self.dtype,
                    )(x, train)

        # timm: head channels are NOT width-scaled for mult <= 1.0 (B0);
        # larger variants scale — round_channels handles both
        head = (
            self.head_ch
            if self.width_mult <= 1.0
            else round_channels(self.head_ch, self.width_mult)
        )
        x = nn.Conv(
            head, (1, 1), use_bias=False, name="conv_head",
            dtype=self.dtype,
        )(x)
        x = nn.silu(_bn("bn2", train, self.dtype)(x))
        return x.mean(axis=(1, 2))

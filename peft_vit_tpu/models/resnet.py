"""ResNet backbone family.

Capability parity with the reference CNN zoo core (full_shot
lib/models/cls_resnet.py + cls_resnet_v2.py + cls_resnetD.py and the
SE/ResNeXt variants; the MODEL_ZOO baselines are all R50-family —
BASELINE.md).  One implementation with switches:

* ``version``: 'v1' (post-act, reference cls_resnet) | 'v2' (pre-act,
  cls_resnet_v2)
* ``deep_stem``: ResNet-D stem (three 3x3 convs; cls_resnetD)
* ``cardinality/base_width``: ResNeXt grouping
* ``se_ratio``: squeeze-excitation blocks (lib/layers/se_layer.py)
* ``frozen_bn``: FrozenBatchNorm2d semantics (lib/layers/batch_norm.py:
  12-148) — BN uses stored statistics, scale/bias foldable, no updates;
  the standard choice for PEFT fine-tuning of CNN backbones.

TPU notes: NHWC layout throughout; BatchNorm in train mode keeps running
stats in a flax ``batch_stats`` collection; under pjit the batch statistics
are computed per-shard and synchronized by ``axis_name`` when given
(cross-replica BN = the DDP SyncBN analog).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics (lib/layers/batch_norm.py:12-148):
    y = (x - mean) / sqrt(var + eps) * scale + bias, all constants during
    training; params live in the tree so converters can fill them."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool = True):
        del use_running_average  # always frozen
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(
            x.dtype
        )


def _norm(norm_kind, name: str, dtype, axis_name=None):
    """norm_kind: True/'frozen' -> FrozenBatchNorm; 'gn' -> GroupNorm(32)
    (BiT / cls_resnet_v2_ws_gn); False/'bn' -> BatchNorm."""
    if norm_kind is True or norm_kind == "frozen":
        return FrozenBatchNorm(name=name, dtype=dtype)
    if norm_kind == "gn":
        return _GroupNormLazy(name, dtype)
    return nn.BatchNorm(
        use_running_average=None,
        momentum=0.9,
        epsilon=1e-5,
        name=name,
        dtype=dtype,
        axis_name=axis_name,
    )


class _GroupNormLazy:
    """GroupNorm with groups chosen from the channel count at call time
    (32 when divisible, else the largest divisor <= 32); ignores the
    use_running_average kwarg so call sites stay uniform."""

    def __init__(self, name, dtype):
        self.name = name
        self.dtype = dtype

    def __call__(self, x, use_running_average=None):
        c = x.shape[-1]
        g = min(32, c)
        while c % g:
            g -= 1
        return nn.GroupNorm(
            num_groups=g, epsilon=1e-5, name=self.name, dtype=self.dtype
        )(x)


class StdConv(nn.Conv):
    """Weight-standardized conv (BiT; cls_resnet_v2_ws_gn): kernel is
    standardized over (kh, kw, in) before the convolution."""

    def param(self, name, *args, **kwargs):
        p = super().param(name, *args, **kwargs)
        if name == "kernel":
            m = jnp.mean(p, axis=(0, 1, 2), keepdims=True)
            v = jnp.var(p, axis=(0, 1, 2), keepdims=True)
            p = (p - m) * jax.lax.rsqrt(v + 1e-10)
        return p


class SqueezeExcite(nn.Module):
    """SE block, SELayer-exact (lib/layers/se_layer.py:4-19): bias-free
    linears and hidden = channels // reduction with no floor (pinned by
    the executed-reference fixture in tests/test_refexec_models.py)."""

    channels: int
    ratio: float = 1.0 / 16.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = max(int(self.channels * self.ratio), 1)
        s = x.mean(axis=(1, 2))
        s = nn.Dense(hidden, use_bias=False, name="fc1", dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(
            self.channels, use_bias=False, name="fc2", dtype=self.dtype
        )(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class Bottleneck(nn.Module):
    out_channels: int  # expanded (4x) channels
    stride: int = 1
    version: str = "v1"
    cardinality: int = 1
    base_width: int = 64
    se_ratio: float = 0.0
    frozen_bn: bool = False
    norm: str = "bn"  # 'bn' | 'gn' | 'frozen'
    weight_standardization: bool = False
    avg_down: bool = False  # ResNet-D downsampling
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        width = int(
            self.out_channels
            / 4
            * (self.base_width / 64.0)
            * self.cardinality
        )
        in_ch = x.shape[-1]
        needs_proj = self.stride != 1 or in_ch != self.out_channels

        kind = "frozen" if self.frozen_bn else self.norm

        def apply_norm(h, name):
            m = _norm(kind, name, self.dtype, self.bn_axis_name)
            if kind in (True, "frozen"):
                return m(h)
            return m(h, use_running_average=not train)

        conv_cls = StdConv if self.weight_standardization else nn.Conv
        conv = lambda ch, k, s, name, groups=1: conv_cls(
            ch,
            (k, k),
            strides=(s, s),
            padding=[(k // 2, k // 2)] * 2,
            use_bias=False,
            feature_group_count=groups,
            name=name,
            dtype=self.dtype,
        )

        if self.version == "v2":
            # pre-activation
            pre = apply_norm(x, "bn_pre")
            pre = nn.relu(pre)
            h = conv(width, 1, 1, "conv1")(pre)
            h = nn.relu(apply_norm(h, "bn1"))
            h = conv(width, 3, self.stride, "conv2", self.cardinality)(h)
            h = nn.relu(apply_norm(h, "bn2"))
            h = conv(self.out_channels, 1, 1, "conv3")(h)
            shortcut = x
            if needs_proj:
                shortcut = conv(
                    self.out_channels, 1, self.stride, "downsample"
                )(pre)
            if self.se_ratio > 0:
                h = SqueezeExcite(
                    self.out_channels, self.se_ratio, dtype=self.dtype,
                    name="se",
                )(h)
            return shortcut + h

        h = conv(width, 1, 1, "conv1")(x)
        h = nn.relu(apply_norm(h, "bn1"))
        h = conv(width, 3, self.stride, "conv2", self.cardinality)(h)
        h = nn.relu(apply_norm(h, "bn2"))
        h = conv(self.out_channels, 1, 1, "conv3")(h)
        h = apply_norm(h, "bn3")
        if self.se_ratio > 0:
            h = SqueezeExcite(
                self.out_channels, self.se_ratio, dtype=self.dtype,
                name="se",
            )(h)
        shortcut = x
        if needs_proj:
            s_in = x
            if self.avg_down and self.stride > 1:
                s_in = nn.avg_pool(
                    x, (2, 2), strides=(2, 2), padding="SAME"
                )
                shortcut = conv(self.out_channels, 1, 1, "downsample")(
                    s_in
                )
            else:
                shortcut = conv(
                    self.out_channels, 1, self.stride, "downsample"
                )(s_in)
            shortcut = apply_norm(shortcut, "bn_down")
        return nn.relu(shortcut + h)


class ResNet(nn.Module):
    """ResNet-{50,101,152} / ResNeXt / SE / -D / v2, NHWC."""

    layers: Sequence[int] = (3, 4, 6, 3)  # R50
    width: int = 64
    version: str = "v1"
    cardinality: int = 1
    base_width: int = 64
    se_ratio: float = 0.0
    # per-stage SE toggle (cls_resnet make_layer se_list/with_se): when
    # set, stage si gets SE only if se_stages[si]; se_ratio supplies the
    # reduction (SELayer default 1/16)
    se_stages: Optional[Sequence[bool]] = None
    deep_stem: bool = False
    avg_down: bool = False
    frozen_bn: bool = False
    norm: str = "bn"  # 'bn' | 'gn' | 'frozen'
    weight_standardization: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        train = not deterministic
        kind = "frozen" if self.frozen_bn else self.norm
        conv_cls = StdConv if self.weight_standardization else nn.Conv
        x = x.astype(self.dtype)
        if self.deep_stem:
            for i, ch in enumerate(
                (self.width // 2, self.width // 2, self.width)
            ):
                x = conv_cls(
                    ch,
                    (3, 3),
                    strides=(2, 2) if i == 0 else (1, 1),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    name=f"stem_conv{i + 1}",
                    dtype=self.dtype,
                )(x)
                m = _norm(
                    kind, f"stem_bn{i + 1}", self.dtype,
                    self.bn_axis_name,
                )
                x = m(x) if kind in (True, "frozen") else m(
                    x, use_running_average=not train
                )
                x = nn.relu(x)
        else:
            x = conv_cls(
                self.width,
                (7, 7),
                strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                use_bias=False,
                name="conv1",
                dtype=self.dtype,
            )(x)
            m = _norm(kind, "bn1", self.dtype, self.bn_axis_name)
            x = m(x) if kind in (True, "frozen") else m(
                x, use_running_average=not train
            )
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        ch = self.width * 4
        for si, depth in enumerate(self.layers):
            stage_se = (
                self.se_ratio
                if (self.se_stages is None or self.se_stages[si])
                else 0.0
            )
            for bi in range(depth):
                x = Bottleneck(
                    out_channels=ch,
                    stride=2 if (bi == 0 and si > 0) else 1,
                    version=self.version,
                    cardinality=self.cardinality,
                    base_width=self.base_width,
                    se_ratio=stage_se,
                    frozen_bn=self.frozen_bn,
                    norm=self.norm,
                    weight_standardization=self.weight_standardization,
                    avg_down=self.avg_down,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{si + 1}_block{bi}",
                    dtype=self.dtype,
                )(x, train)
            ch *= 2

        if self.version == "v2":
            m = _norm(kind, "bn_final", self.dtype, self.bn_axis_name)
            x = m(x) if kind in (True, "frozen") else m(
                x, use_running_average=not train
            )
            x = nn.relu(x)
        return x.mean(axis=(1, 2))


def resnet50(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), **kw)


def resnet101(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), **kw)


def resnext50_32x4d(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), cardinality=32, base_width=4, **kw)


def resnext101_64x4d(**kw) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), cardinality=64, base_width=4, **kw)


def bit_resnet50(**kw) -> ResNet:
    """BiT-R50: pre-act v2 + GroupNorm + weight standardization
    (cls_bit_resnet / cls_resnet_v2_ws_gn)."""
    return ResNet(
        layers=(3, 4, 6, 3),
        version="v2",
        norm="gn",
        weight_standardization=True,
        **kw,
    )


def se_resnext50_32x4d(**kw) -> ResNet:
    # SELayer's default reduction is 16 (se_layer.py:5)
    return ResNet(
        layers=(3, 4, 6, 3),
        cardinality=32,
        base_width=4,
        se_ratio=1.0 / 16.0,
        **kw,
    )

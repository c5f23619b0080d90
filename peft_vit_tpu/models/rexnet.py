"""ReXNet classification backbone (reference lib/models/cls_rexnet.py).

Linear-bottleneck design: 1x1 expand (swish) -> 3x3 depthwise (relu6, +SE
in later blocks) -> 1x1 linear project, with ReXNet's signature partial
residual: when stride is 1, the input adds onto the FIRST in_channels of
the projected output (channels grow linearly block to block).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import SqueezeExcite

Dtype = Any


class LinearBottleneck(nn.Module):
    in_ch: int
    out_ch: int
    stride: int = 1
    expand_ratio: float = 6.0
    use_se: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inp = x

        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=name,
                dtype=self.dtype,
            )(h)

        if self.expand_ratio != 1.0:
            mid = int(round(self.in_ch * self.expand_ratio))
            x = nn.Conv(
                mid, (1, 1), use_bias=False, name="expand",
                dtype=self.dtype,
            )(x)
            x = nn.silu(bn(x, "bn_expand"))  # swish
        else:
            mid = self.in_ch

        x = nn.Conv(
            mid,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            feature_group_count=mid,
            use_bias=False,
            name="dw",
            dtype=self.dtype,
        )(x)
        x = bn(x, "bn_dw")
        if self.use_se:
            x = SqueezeExcite(
                mid, ratio=1.0 / 12, name="se", dtype=self.dtype
            )(x)
        x = jnp.clip(x, 0.0, 6.0)  # relu6

        x = nn.Conv(
            self.out_ch, (1, 1), use_bias=False, name="project",
            dtype=self.dtype,
        )(x)
        x = bn(x, "bn_project")

        if self.stride == 1 and self.in_ch <= self.out_ch:
            # ReXNet partial residual: add onto the first in_ch channels
            x = x.at[:, :, :, : self.in_ch].add(
                inp[:, :, :, : self.in_ch]
            )
        return x


def _rexnet_channels(
    width_mult: float = 1.0, depth_mult: float = 1.0
) -> List[Tuple[int, int, int, float, bool]]:
    """(in, out, stride, expand, use_se) per block (ReXNet-1.0 recipe)."""
    layers = [1, 2, 2, 3, 3, 5]
    strides = [1, 2, 2, 2, 1, 2]
    layers = [max(int(round(l * depth_mult)), 1) for l in layers]
    depth = sum(layers)
    # channels grow linearly from 16 to 180 (+ stem 32)
    inplanes = 16.0 / width_mult
    base = 180.0 / depth
    cfg = []
    strides_flat = sum(
        [[s] + [1] * (l - 1) for s, l in zip(strides, layers)], []
    )
    se_flat = sum(
        [[se] * l for se, l in zip([False, False, True, True, True, True],
                                   layers)],
        [],
    )
    in_ch = int(round(inplanes * width_mult))
    for i in range(depth):
        out_ch = int(round((inplanes + base * (i + 1)) * width_mult))
        expand = 1.0 if i == 0 else 6.0
        cfg.append((in_ch, out_ch, strides_flat[i], expand, se_flat[i]))
        in_ch = out_ch
    return cfg


class ReXNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        train = not deterministic
        x = x.astype(self.dtype)
        stem_ch = int(round(32 * self.width_mult))
        x = nn.Conv(
            stem_ch,
            (3, 3),
            strides=(2, 2),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            name="stem",
            dtype=self.dtype,
        )(x)
        x = nn.silu(
            nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="stem_bn",
                dtype=self.dtype,
            )(x)
        )
        cfg = _rexnet_channels(self.width_mult, self.depth_mult)
        # first block consumes the stem channels
        cfg[0] = (stem_ch, cfg[0][1], cfg[0][2], cfg[0][3], cfg[0][4])
        for i, (cin, cout, s, t, se) in enumerate(cfg):
            x = LinearBottleneck(
                cin,
                cout,
                stride=s,
                expand_ratio=t,
                use_se=se,
                name=f"block{i}",
                dtype=self.dtype,
            )(x, train)
        head_ch = int(round(1280 * self.width_mult))
        x = nn.Conv(
            head_ch, (1, 1), use_bias=False, name="head_conv",
            dtype=self.dtype,
        )(x)
        x = nn.silu(
            nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="head_bn",
                dtype=self.dtype,
            )(x)
        )
        return x.mean(axis=(1, 2))

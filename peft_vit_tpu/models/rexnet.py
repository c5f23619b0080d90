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

Dtype = Any


class ReXNetSE(nn.Module):
    """ReXNet's own SE (cls_rexnet.py:72-87) — unlike the generic
    SELayer it runs 1x1 convs WITH bias and a BatchNorm between the
    reduce conv and the ReLU, and reduces to exactly channels//se_ratio
    (no floor).  Pinned by the executed-reference fixture."""

    channels: int
    se_ratio: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        hidden = max(self.channels // self.se_ratio, 1)
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(hidden, (1, 1), name="fc1", dtype=self.dtype)(s)
        s = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
            dtype=self.dtype,
        )(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), name="fc2", dtype=self.dtype)(s)
        return x * jax.nn.sigmoid(s)


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
            x = ReXNetSE(mid, name="se", dtype=self.dtype)(x, train)
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
    width_mult: float = 1.0, depth_mult: float = 1.0,
    input_ch: int = 16, final_ch: int = 180,
) -> List[Tuple[int, int, int, float, bool]]:
    """(in, out, stride, expand, use_se) per block — the EXACT reference
    schedule (cls_rexnet.py ReXNetV1.__init__:131-170): depths by ceil,
    stem/input channels divided by width_mult when width_mult < 1 (so the
    stem stays 32 and block 0's output stays input_ch), NO growth on
    block 0, inplanes += final_ch/depth before each later block's output,
    t=1 for every block of the first stage."""
    import math

    layers = [math.ceil(e * depth_mult) for e in [1, 2, 2, 3, 3, 5]]
    strides_flat = sum(
        [[s] + [1] * (l - 1)
         for s, l in zip([1, 2, 2, 2, 1, 2], layers)],
        [],
    )
    se_flat = sum(
        [[se] * l for se, l in zip([False, False, True, True, True, True],
                                   layers)],
        [],
    )
    depth = sum(layers)
    ts = [1.0] * layers[0] + [6.0] * (depth - layers[0])
    stem_raw = 32 / width_mult if width_mult < 1.0 else 32
    inplanes = input_ch / width_mult if width_mult < 1.0 else input_ch
    cfg = []
    for i in range(depth):
        if i == 0:
            cin = int(round(stem_raw * width_mult))
            cout = int(round(inplanes * width_mult))
        else:
            cin = int(round(inplanes * width_mult))
            inplanes += final_ch / depth
            cout = int(round(inplanes * width_mult))
        cfg.append((cin, cout, strides_flat[i], ts[i], se_flat[i]))
    return cfg


def rexnet_stem_channels(width_mult: float) -> int:
    stem_raw = 32 / width_mult if width_mult < 1.0 else 32
    return int(round(stem_raw * width_mult))


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
        stem_ch = rexnet_stem_channels(self.width_mult)
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
        head_ch = int(1280 * self.width_mult)  # reference floors (:172)
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

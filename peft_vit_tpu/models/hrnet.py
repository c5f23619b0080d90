"""HRNet classification backbone.

Capability parity with the reference HRNet family (full_shot
lib/models/cls_hrnet.py and the v2-v4 variants — the largest CNN entry in
its zoo).  Faithful structure, TPU-native NHWC implementation:

* stem: two stride-2 3x3 convs
* stage 1: 4 bottlenecks at 64 -> 256 channels
* stages 2-4: parallel multi-resolution branches (widths W, 2W, 4W, 8W);
  each module runs 4 basic blocks per branch then fuses every pair of
  resolutions (1x1 conv + nearest upsample going up; chains of stride-2
  3x3 convs going down)
* classification head: per-branch bottleneck to (128, 256, 512, 1024),
  strided downsample-add chain, 1x1 conv to 2048, global pool

All resamplings are static-shape (nearest upsample = reshape-broadcast),
so the whole network lowers to fused XLA convolutions.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _conv(ch, k, s, name, dtype, groups=1, use_bias=False):
    return nn.Conv(
        ch,
        (k, k),
        strides=(s, s),
        padding=[(k // 2, k // 2)] * 2,
        use_bias=use_bias,
        feature_group_count=groups,
        name=name,
        dtype=dtype,
    )


def _upsample_nearest(x: jax.Array, factor: int) -> jax.Array:
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class _BN(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class BasicBlock(nn.Module):
    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv(self.channels, 3, 1, "conv1", self.dtype)(x)
        h = nn.relu(_BN(self.dtype, name="bn1")(h, train))
        h = _conv(self.channels, 3, 1, "conv2", self.dtype)(h)
        h = _BN(self.dtype, name="bn2")(h, train)
        return nn.relu(x + h)


class BottleneckBlock(nn.Module):
    out_channels: int  # expanded (4x)
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = self.out_channels // 4
        h = _conv(width, 1, 1, "conv1", self.dtype)(x)
        h = nn.relu(_BN(self.dtype, name="bn1")(h, train))
        h = _conv(width, 3, self.stride, "conv2", self.dtype)(h)
        h = nn.relu(_BN(self.dtype, name="bn2")(h, train))
        h = _conv(self.out_channels, 1, 1, "conv3", self.dtype)(h)
        h = _BN(self.dtype, name="bn3")(h, train)
        shortcut = x
        if x.shape[-1] != self.out_channels or self.stride != 1:
            shortcut = _conv(
                self.out_channels, 1, self.stride, "downsample", self.dtype
            )(x)
            shortcut = _BN(self.dtype, name="bn_down")(shortcut, train)
        return nn.relu(shortcut + h)


class FuseLayer(nn.Module):
    """Cross-resolution fusion: out[i] = relu(sum_j resample(x[j] -> i))."""

    widths: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        n = len(xs)
        for i in range(n):
            acc = None
            for j in range(n):
                y = xs[j]
                if j > i:  # lower res -> up: 1x1 conv + nearest upsample
                    y = _conv(
                        self.widths[i], 1, 1, f"up_{j}_{i}", self.dtype
                    )(y)
                    y = _BN(self.dtype, name=f"up_bn_{j}_{i}")(y, train)
                    y = _upsample_nearest(y, 2 ** (j - i))
                elif j < i:  # higher res -> down: chain of stride-2 3x3
                    for k in range(i - j):
                        last = k == i - j - 1
                        ch = self.widths[i] if last else self.widths[j]
                        y = _conv(
                            ch, 3, 2, f"down_{j}_{i}_{k}", self.dtype
                        )(y)
                        y = _BN(
                            self.dtype, name=f"down_bn_{j}_{i}_{k}"
                        )(y, train)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    widths: Sequence[int]
    blocks_per_branch: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        ys = []
        for bi, x in enumerate(xs):
            for k in range(self.blocks_per_branch):
                x = BasicBlock(
                    self.widths[bi],
                    name=f"branch{bi}_block{k}",
                    dtype=self.dtype,
                )(x, train)
            ys.append(x)
        return FuseLayer(self.widths, name="fuse", dtype=self.dtype)(
            ys, train
        )


class HRNet(nn.Module):
    """HRNet-W{width} classification backbone -> pooled 2048-d feature."""

    width: int = 18
    stage_modules: Sequence[int] = (1, 4, 3)  # modules in stages 2-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        train = not deterministic
        w = self.width
        widths = [w, 2 * w, 4 * w, 8 * w]
        h_in, w_in = x.shape[1], x.shape[2]
        divisor = 4 * 2 ** (len(self.stage_modules))  # stem/4, branch /2 each
        if h_in % divisor or w_in % divisor:
            raise ValueError(
                f"HRNet needs input H/W divisible by {divisor} "
                f"(multi-resolution fusion), got {h_in}x{w_in}"
            )
        x = x.astype(self.dtype)

        # stem
        x = _conv(64, 3, 2, "stem_conv1", self.dtype)(x)
        x = nn.relu(_BN(self.dtype, name="stem_bn1")(x, train))
        x = _conv(64, 3, 2, "stem_conv2", self.dtype)(x)
        x = nn.relu(_BN(self.dtype, name="stem_bn2")(x, train))

        # stage 1: 4 bottlenecks at 256
        for k in range(4):
            x = BottleneckBlock(
                256, name=f"layer1_block{k}", dtype=self.dtype
            )(x, train)

        # transitions + stages 2..4
        branches = [x]
        for si, n_modules in enumerate(self.stage_modules):
            n_branches = si + 2
            new_branches = []
            for bi in range(n_branches):
                if bi < len(branches):
                    y = branches[bi]
                    if y.shape[-1] != widths[bi]:
                        y = _conv(
                            widths[bi], 3, 1,
                            f"transition{si}_{bi}", self.dtype,
                        )(y)
                        y = nn.relu(
                            _BN(
                                self.dtype,
                                name=f"transition{si}_bn{bi}",
                            )(y, train)
                        )
                else:  # new lowest-resolution branch
                    y = _conv(
                        widths[bi], 3, 2,
                        f"transition{si}_{bi}", self.dtype,
                    )(branches[-1])
                    y = nn.relu(
                        _BN(
                            self.dtype, name=f"transition{si}_bn{bi}"
                        )(y, train)
                    )
                new_branches.append(y)
            branches = new_branches
            for mi in range(n_modules):
                branches = HRModule(
                    widths[:n_branches],
                    name=f"stage{si + 2}_module{mi}",
                    dtype=self.dtype,
                )(branches, train)

        # classification head (cls_hrnet incre/downsample/final chain)
        incre = [128, 256, 512, 1024]
        y = BottleneckBlock(
            incre[0], name="incre0", dtype=self.dtype
        )(branches[0], train)
        for i in range(1, len(branches)):
            z = BottleneckBlock(
                incre[i], name=f"incre{i}", dtype=self.dtype
            )(branches[i], train)
            # the head's downsampling convs carry a bias — unlike every
            # other HRNet conv (cls_hrnet.py:379-386 uses the nn.Conv2d
            # default); pinned by refexec_hrnet.npz
            y = _conv(
                incre[i], 3, 2, f"down{i}", self.dtype, use_bias=True
            )(y)
            y = nn.relu(
                _BN(self.dtype, name=f"down_bn{i}")(y, train)
            )
            y = y + z
        y = _conv(
            2048, 1, 1, "final_conv", self.dtype, use_bias=True
        )(y)  # proj conv has a bias too (cls_hrnet.py:395-403)
        y = nn.relu(_BN(self.dtype, name="final_bn")(y, train))
        return y.mean(axis=(1, 2))

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


# ---------------------------------------------------------------------------
# The v2-v4 HRNet family (cls_hrnet_v2.py / cls_hrnet_v2_share.py /
# cls_hrnet_v3.py / cls_hrnet_v4.py): lighter stems, inverted-residual
# (MobileNet-style) blocks with SE, and the "chained" fuse — instead of
# fusing every pair of resolutions, one stride-2 conv chain runs down the
# branch list and one 1x1+nearest-up chain runs up, with relu applied to
# the running sums (cls_hrnet_v4.py:314-380).
# ---------------------------------------------------------------------------


def _make_divisible(v, divisor=8, min_value=None):
    """timm's channel rounding (cls_hrnet_v4.py:137-143)."""
    min_value = min_value or divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SEBlockLinear(nn.Module):
    """Reference SELayer (lib/layers/se_layer.py): pooled -> Linear
    (no bias) -> relu -> Linear (no bias) -> sigmoid gate.  ``reduction``
    uses torch integer division (channel // reduction)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))
        y = nn.Dense(
            c // self.reduction, use_bias=False, name="fc0", dtype=self.dtype
        )(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, name="fc2", dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


def _maybe_downsample(x, out_ch, stride, dtype, train, conv_bias=False):
    """conv1x1(+stride)+BN shortcut when shape changes.

    Both reference build sites reduce to this: ``_build_layer`` uses
    Conv1x1+BN directly (cls_hrnet_v4.py:609-615); ``_make_one_branch``
    prepends AvgPool2d(kernel=stride, stride=stride) (:272-287) — but
    branches are only ever built with stride=1, where the AvgPool is the
    identity (kernel 1, stride 1), so the executed math is identical."""
    if stride == 1 and x.shape[-1] == out_ch:
        return x
    y = _conv(out_ch, 1, stride, "downsample", dtype, use_bias=conv_bias)(x)
    return _BN(dtype, name="bn_down")(y, train)


class BasicBlockV(nn.Module):
    """v2-v4 BasicBlock (cls_hrnet_v4.py:32-77): 3x3-3x3 with optional
    SE(reduction=1!) and an optional final relu (v2 drops it on the last
    block of every branch because the chained fuse relu's the sums)."""

    channels: int
    stride: int = 1
    with_se: bool = False
    with_relu: bool = True
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _conv(
            self.channels, 3, self.stride, "conv1", self.dtype,
            groups=self.groups,
        )(x)
        h = nn.relu(_BN(self.dtype, name="bn1")(h, train))
        h = _conv(
            self.channels, 3, 1, "conv2", self.dtype, groups=self.groups
        )(h)
        h = _BN(self.dtype, name="bn2")(h, train)
        if self.with_se:
            h = SEBlockLinear(1, name="se", dtype=self.dtype)(h)
        res = _maybe_downsample(
            x, self.channels, self.stride, self.dtype, train
        )
        h = h + res
        return nn.relu(h) if self.with_relu else h


class BottleneckV(nn.Module):
    """v2-v4 Bottleneck (cls_hrnet_v4.py:80-134): 1-3-1 at 4x expansion,
    optional SE(reduction=16) on the expanded channels; v2 puts ``groups``
    on the 3x3 only."""

    planes: int  # expanded out = 4 * planes
    stride: int = 1
    with_se: bool = False
    with_relu: bool = True
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.planes * 4
        h = _conv(self.planes, 1, 1, "conv1", self.dtype)(x)
        h = nn.relu(_BN(self.dtype, name="bn1")(h, train))
        h = _conv(
            self.planes, 3, self.stride, "conv2", self.dtype,
            groups=self.groups,
        )(h)
        h = nn.relu(_BN(self.dtype, name="bn2")(h, train))
        h = _conv(out_ch, 1, 1, "conv3", self.dtype)(h)
        h = _BN(self.dtype, name="bn3")(h, train)
        if self.with_se:
            h = SEBlockLinear(16, name="se", dtype=self.dtype)(h)
        res = _maybe_downsample(x, out_ch, self.stride, self.dtype, train)
        h = h + res
        return nn.relu(h) if self.with_relu else h


class InvertedResidual(nn.Module):
    """v3/v4 inverted-residual block (cls_hrnet_v4.py:146-216): pw-expand
    -> dw3x3 -> SE(reduction=4 on the expanded width) -> pw-linear, all
    convs WITH bias (the reference leaves nn.Conv2d's default on — unlike
    every other HRNet conv), linear output + residual (no final relu)."""

    out_channels: int
    stride: int = 1
    exp_ratio: float = 6.0
    with_se: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = _make_divisible(x.shape[-1] * self.exp_ratio)
        h = _conv(mid, 1, 1, "conv_pw", self.dtype, use_bias=True)(x)
        h = nn.relu(_BN(self.dtype, name="bn1")(h, train))
        h = _conv(
            mid, 3, self.stride, "conv_dw", self.dtype,
            groups=mid, use_bias=True,
        )(h)
        h = nn.relu(_BN(self.dtype, name="bn2")(h, train))
        if self.with_se:
            h = SEBlockLinear(4, name="se", dtype=self.dtype)(h)
        h = _conv(
            self.out_channels, 1, 1, "conv_pwl", self.dtype, use_bias=True
        )(h)
        h = _BN(self.dtype, name="bn3")(h, train)
        res = _maybe_downsample(
            x, self.out_channels, self.stride, self.dtype, train
        )
        return h + res


_EXPANSION = {"BASIC": 1, "BOTTLENECK": 4, "INVERTED": 1}


def _make_block(
    block, planes, with_se, with_relu, groups, name, dtype, stride=1
):
    if block == "BASIC":
        return BasicBlockV(
            planes, stride, with_se, with_relu, groups, name=name,
            dtype=dtype,
        )
    if block == "BOTTLENECK":
        return BottleneckV(
            planes, stride, with_se, with_relu, groups, name=name,
            dtype=dtype,
        )
    if block == "INVERTED":
        return InvertedResidual(
            planes, stride, 6.0, with_se, name=name, dtype=dtype
        )
    raise ValueError(f"unknown HRNet block {block!r}")


class HRModuleV2(nn.Module):
    """One v2-v4 HighResolutionModule: per-branch block stacks + the
    CHAINED fuse (cls_hrnet_v4.py:314-380) — one stride-2 conv chain runs
    high->low accumulating relu'd sums, one 1x1+nearest-up chain runs
    low->high, and out[i] = relu(x[i] + down_chain[i] + up_chain[n-1-i]).

    ``v2_relu``: cls_hrnet_v2.py:223-225 builds the LAST block of every
    branch with with_relu=False (the fuse supplies the relu).
    ``share``: cls_hrnet_v2_share.py — branch modules are weight-shared
    across resolutions; branch i's input is channel-split into the
    cumulative deltas and each split runs through the corresponding
    (shared) lower-branch stack (:302-310)."""

    num_channels: Tuple[int, ...]  # planes per branch
    block: str
    num_blocks: Tuple[int, ...]
    with_se: bool = False
    groups: Tuple[int, ...] = ()
    v2_relu: bool = False
    share: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        n = len(xs)
        exp = _EXPANSION[self.block]
        out_ch = [c * exp for c in self.num_channels]
        groups = self.groups or (1,) * n

        def stack(b, planes):
            blocks = []
            for k in range(self.num_blocks[b]):
                last = k == self.num_blocks[b] - 1
                blocks.append(
                    _make_block(
                        self.block,
                        planes,
                        self.with_se,
                        not (self.v2_relu and last),
                        groups[b],
                        f"branch{b}_block{k}",
                        self.dtype,
                    )
                )
            return blocks

        if self.share:
            in_ch = [x.shape[-1] for x in xs]
            stacks = []
            for b in range(n):
                planes = self.num_channels[b] - (
                    self.num_channels[b - 1] if b else 0
                )
                stacks.append(stack(b, planes))

            def run(b, x):
                for blk in stacks[b]:
                    x = blk(x, train)
                return x

            ys = [run(0, xs[0])]
            for i in range(1, n):
                sizes = [in_ch[0]] + [
                    in_ch[j] - in_ch[j - 1] for j in range(1, i + 1)
                ]
                offsets = [
                    sum(sizes[: k + 1]) for k in range(len(sizes) - 1)
                ]
                splits = jnp.split(xs[i], offsets, axis=-1)
                ys.append(
                    jnp.concatenate(
                        [run(j, splits[j]) for j in range(i + 1)], axis=-1
                    )
                )
        else:
            ys = []
            for b in range(n):
                x = xs[b]
                for blk in stack(b, self.num_channels[b]):
                    x = blk(x, train)
                ys.append(x)

        if n == 1:
            return [nn.relu(ys[0])]

        x_down = [None]
        x_up = [None]
        for i in range(n - 1):
            d_in = ys[i] if x_down[i] is None else x_down[i] + ys[i]
            d = _conv(
                out_ch[i + 1], 3, 2, f"fuse_down{i}", self.dtype
            )(nn.relu(d_in))
            x_down.append(
                _BN(self.dtype, name=f"fuse_down_bn{i}")(d, train)
            )
            u_in = (
                ys[n - 1 - i]
                if x_up[i] is None
                else ys[n - 1 - i] + x_up[i]
            )
            u = _conv(
                out_ch[n - 2 - i], 1, 1, f"fuse_up{i}", self.dtype
            )(nn.relu(u_in))
            u = _BN(self.dtype, name=f"fuse_up_bn{i}")(u, train)
            x_up.append(_upsample_nearest(u, 2))

        outs = []
        for i in range(n):
            s = ys[i]
            if x_down[i] is not None:
                s = s + x_down[i]
            if x_up[n - 1 - i] is not None:
                s = s + x_up[n - 1 - i]
            outs.append(nn.relu(s))
        return outs


class HRNetV(nn.Module):
    """cls_hrnet_v2 / v2_share / v3 / v4 -> pooled feature vector.

    Version differences, all reproduced exactly:

    * stem — v2: two stride-2 3x3 convs to 64 + 4 SE-bottlenecks to 256
      (cls_hrnet_v2.py:325-332); v3: 3->16->24 convs + 2 inverted
      residuals (cls_hrnet_v3.py:397-407); v4: selected by
      ``MODEL.EXTRA.STEM_SPEC`` (cls_hrnet_v4.py:437-512).  NOTE the
      'inv32e2wosex1' stem's InvertedResidual is constructed WITHOUT
      with_se=False (:482) so, despite the name, its SE gate is ON —
      reproduced faithfully.
    * transition input — v3/v4 feed every transition from the LAST
      previous branch (cls_hrnet_v4.py:673-677); v2 feeds existing
      branches from their own resolution (cls_hrnet_v2.py:543-546).
    * branch relu — v2 drops the final relu on each branch's last block;
      the chained fuse supplies it.
    * head — per-branch incre block (v2 ASKS for with_relu=False but the
      flag never reaches a single-block layer's first block — see the
      in-line note), bias-carrying
      stride-2 downsample convs (nn.Conv2d default, cls_hrnet_v4.py:
      541-550), relu-before-downsample add chain, optional 1x1 proj.
    """

    version: str = "v4"  # 'v2' | 'v2_share' | 'v3' | 'v4'
    stem_spec: str = "conv32s2maxpools2inv32e6x1"  # v4 only
    num_modules: Tuple[int, ...] = (1, 2, 1)
    num_branches: Tuple[int, ...] = (2, 3, 4)
    num_blocks: Tuple[Tuple[int, ...], ...] = ((2, 2), (2, 2, 2), (2, 2, 2, 2))
    num_channels: Tuple[Tuple[int, ...], ...] = (
        (18, 36), (18, 36, 72), (18, 36, 72, 144)
    )
    block: Tuple[str, ...] = ("INVERTED", "INVERTED", "INVERTED")
    groups: Tuple[Tuple[int, ...], ...] = ()
    head_block: Tuple[str, ...] = ("INVERTED",) * 4
    head_channels: Tuple[int, ...] = (32, 64, 128, 256)
    head_proj: int = 2048
    with_se: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        train = not deterministic
        x = x.astype(self.dtype)
        v = self.version

        # ---- stem
        if v in ("v2", "v2_share"):
            x = _conv(64, 3, 2, "stem_conv1", self.dtype)(x)
            x = nn.relu(_BN(self.dtype, name="stem_bn1")(x, train))
            x = _conv(64, 3, 2, "stem_conv2", self.dtype)(x)
            x = nn.relu(_BN(self.dtype, name="stem_bn2")(x, train))
            for k in range(4):
                x = BottleneckV(
                    64, with_se=self.with_se,
                    name=f"layer1_block{k}", dtype=self.dtype,
                )(x, train)
        elif v == "v3":
            x = _conv(16, 3, 2, "stem_conv1", self.dtype)(x)
            x = nn.relu(_BN(self.dtype, name="stem_bn1")(x, train))
            x = _conv(24, 3, 2, "stem_conv2", self.dtype)(x)
            x = nn.relu(_BN(self.dtype, name="stem_bn2")(x, train))
            for k in range(2):
                x = InvertedResidual(
                    24, with_se=self.with_se,
                    name=f"layer1_block{k}", dtype=self.dtype,
                )(x, train)
        elif v == "v4":
            x = self._stem_v4(x, train)
        else:
            raise ValueError(f"unknown HRNet version {v!r}")

        # ---- stages
        ys = [x]
        prev_ch = [x.shape[-1]]
        for i in range(len(self.num_modules)):
            nb = self.num_branches[i]
            cur_ch = list(self.num_channels[i])
            xs = []
            for j in range(nb):
                if j < len(prev_ch):
                    if prev_ch[j] != cur_ch[j]:
                        # existing branch, channel change: 3x3 s1+BN+relu;
                        # v3/v4 read it off the LAST branch (quirk)
                        src = (
                            ys[j] if v in ("v2", "v2_share") else ys[-1]
                        )
                        t = _conv(
                            cur_ch[j], 3, 1,
                            f"transition{i + 1}_{j}", self.dtype,
                        )(src)
                        xs.append(
                            nn.relu(
                                _BN(
                                    self.dtype,
                                    name=f"transition{i + 1}_bn{j}",
                                )(t, train)
                            )
                        )
                    else:
                        xs.append(ys[j])
                else:
                    # new lowest branch: stride-2 chain from the last
                    t = ys[-1]
                    for k in range(j + 1 - len(prev_ch)):
                        last = k == j - len(prev_ch)
                        ch = cur_ch[j] if last else prev_ch[-1]
                        t = _conv(
                            ch, 3, 2,
                            f"transition{i + 1}_{j}_{k}", self.dtype,
                        )(t)
                        t = nn.relu(
                            _BN(
                                self.dtype,
                                name=f"transition{i + 1}_bn{j}_{k}",
                            )(t, train)
                        )
                    xs.append(t)
            for m in range(self.num_modules[i]):
                xs = HRModuleV2(
                    tuple(cur_ch),
                    self.block[i],
                    tuple(self.num_blocks[i]),
                    with_se=self.with_se,
                    groups=tuple(self.groups[i]) if self.groups else (),
                    v2_relu=v in ("v2", "v2_share"),
                    share=v == "v2_share",
                    name=f"stage{i + 2}_m{m}",
                    dtype=self.dtype,
                )(xs, train)
            ys = xs
            prev_ch = [
                c * _EXPANSION[self.block[i]] for c in cur_ch
            ]

        # ---- head
        hexp = [_EXPANSION[b] for b in self.head_block]
        # v2 passes with_relu=False for the incre blocks, but its
        # _build_layer never forwards with_relu to the FIRST block
        # (cls_hrnet_v2.py:476-477 — only blocks i>=1 get it at :485-486),
        # so with blocks=1 the flag is dead and the executed incre relu
        # is ON.  Pinned by refexec_hrnet_v2.npz.
        y = _make_block(
            self.head_block[0],
            self.head_channels[0],
            self.with_se,
            True,
            1,
            "incre0",
            self.dtype,
        )(ys[0], train)
        for i in range(len(ys) - 1):
            z = _make_block(
                self.head_block[i + 1],
                self.head_channels[i + 1],
                self.with_se,
                True,
                1,
                f"incre{i + 1}",
                self.dtype,
            )(ys[i + 1], train)
            # head downsample convs carry biases (nn.Conv2d default,
            # cls_hrnet_v4.py:541-550); conv+BN, NO relu — the relu is
            # applied to y BEFORE the conv (forward :682-684)
            d = _conv(
                self.head_channels[i + 1] * hexp[i],
                3, 2, f"down{i + 1}", self.dtype, use_bias=True,
            )(nn.relu(y))
            y = z + _BN(self.dtype, name=f"down_bn{i + 1}")(d, train)
        y = nn.relu(y)
        if self.head_proj > 0:
            y = _conv(
                self.head_proj, 1, 1, "final_conv", self.dtype,
                use_bias=True,
            )(y)
            y = nn.relu(_BN(self.dtype, name="final_bn")(y, train))
        return y.mean(axis=(1, 2))

    def _stem_v4(self, x, train):
        spec = self.stem_spec

        def cbr(x, ch, stride, idx):
            x = _conv(ch, 3, stride, f"stem_conv{idx}", self.dtype)(x)
            return nn.relu(
                _BN(self.dtype, name=f"stem_bn{idx}")(x, train)
            )

        def maxpool(x):
            return nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )

        if spec == "conv16s2conv24s2inv24e6x2":
            x = cbr(x, 16, 2, 1)
            x = cbr(x, 24, 2, 2)
            for k in range(2):
                x = InvertedResidual(
                    24, with_se=self.with_se,
                    name=f"layer1_block{k}", dtype=self.dtype,
                )(x, train)
        elif spec == "conv32s2maxpools2":
            x = maxpool(cbr(x, 32, 2, 1))
        elif spec == "conv32s2maxpools2inv32e6x1":
            x = maxpool(cbr(x, 32, 2, 1))
            x = InvertedResidual(
                32, with_se=self.with_se,
                name="layer1_block0", dtype=self.dtype,
            )(x, train)
        elif spec == "conv32s2maxpools2inv32e2wosex1":
            # the reference constructs this block WITHOUT with_se=False
            # (cls_hrnet_v4.py:482) so its SE is ON despite the name
            x = maxpool(cbr(x, 32, 2, 1))
            x = InvertedResidual(
                32, exp_ratio=2.0, with_se=True,
                name="layer1_block0", dtype=self.dtype,
            )(x, train)
        elif spec == "conv32s2inv32e6s2x1":
            x = cbr(x, 32, 2, 1)
            x = InvertedResidual(
                32, stride=2, with_se=self.with_se,
                name="layer1_block0", dtype=self.dtype,
            )(x, train)
        elif spec == "conv24s2inv24e6s2x1":
            x = cbr(x, 24, 2, 1)
            x = InvertedResidual(
                24, stride=2, with_se=self.with_se,
                name="layer1_block0", dtype=self.dtype,
            )(x, train)
        else:
            raise ValueError(f"unknown STEM_SPEC {spec!r}")
        return x

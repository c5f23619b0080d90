"""ResNet backbone family.

Capability parity with the reference CNN zoo core (full_shot
lib/models/cls_resnet.py + cls_resnet_v2.py + cls_resnetD.py and the
SE/ResNeXt variants; the MODEL_ZOO baselines are all R50-family —
BASELINE.md).  One implementation with switches:

* ``version``: 'v1' (post-act, reference cls_resnet) | 'v2' (pre-act,
  cls_resnet_v2) | 'd' (cls_resnetD PreActBottleneck: act0 on the block
  input, downsample fed from act0's output, ``bn3`` applied AFTER the
  residual add — cls_resnetD.py:95-121)
* ``deep_stem``: ResNet-D stem (three 3x3 convs; cls_resnetD)
* ``cardinality/base_width``: ResNeXt grouping
* ``se_ratio``: squeeze-excitation blocks (lib/layers/se_layer.py)
* ``frozen_bn``: FrozenBatchNorm2d semantics (lib/layers/batch_norm.py:
  12-148) — BN uses stored statistics, scale/bias foldable, no updates;
  the standard choice for PEFT fine-tuning of CNN backbones.
* ``with_relu``: cls_resnet.py/cls_resnetP.py Bottleneck's WITH_RELU
  toggle — skip the post-residual ReLU.
* ``proj_dims``: cls_resnetP.py's DIMS_PROJ MLP projection between the
  pooled feature and the classifier head (cls_resnetP.py:202-224).
* ``dy_relu``: DYReLU2 dynamic activations replacing ReLU in the 'd'
  blocks/stem (MODEL.SPEC.DY_RELU, cls_resnetD.py:20-37).
* ``dropblock_stages/keep_prob/block_size``: DropBlock on the listed
  stages (AUG.DROPBLOCK_*, cls_resnet.py:409-419); the linear keep-prob
  anneal is driven by the call-time ``progress`` scalar (see
  ops/dropblock.py for the reference-quirk discussion).  Training with
  DropBlock active needs a ``dropblock`` PRNG stream in ``apply``.

TPU notes: NHWC layout throughout; BatchNorm in train mode keeps running
stats in a flax ``batch_stats`` collection; under pjit the batch statistics
are computed per-shard and synchronized by ``axis_name`` when given
(cross-replica BN = the DDP SyncBN analog).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropblock import drop_block, scheduled_keep_prob, stage_keep_prob

Dtype = Any


class DyReLUSpec(NamedTuple):
    """Static DYReLU2 hyperparameters (MODEL.SPEC.DY_RELU keys,
    cls_resnetD.py:20-37); a NamedTuple so flax module fields stay
    hashable."""

    reduction: int = 4
    lambda_a: float = 1.0
    k2: bool = True
    use_bias: bool = True
    init_a: Tuple[float, float] = (1.0, 0.0)
    init_b: Tuple[float, float] = (0.0, 0.0)


def _make_divisible(v, divisor, min_value=None):
    # dy_relu.py:8-15
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class DyReLU(nn.Module):
    """DYReLU2 (lib/layers/dy_relu.py:28-97): a channel-attention MLP
    picks per-channel piecewise-linear activation coefficients —
    ``max(x*a1 + b1, x*a2 + b2)`` in the default K2+bias configuration.
    The coefficient head is avg-pool -> Linear(squeeze) -> ReLU ->
    Linear(C*exp) -> h_sigmoid (= relu6(y+3)/6)."""

    channels: int
    spec: DyReLUSpec = DyReLUSpec()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = self.spec
        exp = (4 if s.use_bias else 2) if s.k2 else (2 if s.use_bias else 1)
        if s.reduction == 4:
            squeeze = self.channels // s.reduction
        else:
            squeeze = _make_divisible(self.channels // s.reduction, 4)
        y = x.astype(jnp.float32).mean(axis=(1, 2))
        y = nn.Dense(squeeze, name="fc1", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels * exp, name="fc2", dtype=self.dtype)(y)
        y = nn.relu6(y + 3.0) / 6.0  # h_sigmoid, h_max=1 (dy_relu.py:18-25)
        y = y[:, None, None, :].astype(x.dtype)
        lam = s.lambda_a * 2.0  # dy_relu.py:33 ``lambda_a * 2``
        c = self.channels
        if exp == 4:
            a1 = (y[..., :c] - 0.5) * lam + s.init_a[0]
            b1 = y[..., c : 2 * c] - 0.5 + s.init_b[0]
            a2 = (y[..., 2 * c : 3 * c] - 0.5) * lam + s.init_a[1]
            b2 = y[..., 3 * c :] - 0.5 + s.init_b[1]
            return jnp.maximum(x * a1 + b1, x * a2 + b2)
        if exp == 2:
            if s.use_bias:
                a1 = (y[..., :c] - 0.5) * lam + s.init_a[0]
                b1 = y[..., c:] - 0.5 + s.init_b[0]
                return x * a1 + b1
            a1 = (y[..., :c] - 0.5) * lam + s.init_a[0]
            a2 = (y[..., c:] - 0.5) * lam + s.init_a[1]
            return jnp.maximum(x * a1, x * a2)
        a1 = (y - 0.5) * lam + s.init_a[0]
        return x * a1


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
    # cls_resnet.py/cls_resnetP.py WITH_RELU: skip the post-residual ReLU
    with_relu: bool = True
    # DYReLU2 replaces ReLU in the 'd' block (cls_resnetD.py:58-86)
    dy_relu: Optional[DyReLUSpec] = None
    # DropBlock after each conv (+ on the residual): cls_resnet.py:
    # 122-143 / cls_resnetD.py:103-119; the scheduled keep prob arrives
    # per call (db_keep) so the anneal stays inside jit
    use_dropblock: bool = False
    dropblock_size: int = 7
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, db_keep=None
    ) -> jax.Array:
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

        dropblock_on = self.use_dropblock and train and db_keep is not None

        def db(h):
            # each application site draws its own mask, like the
            # reference's repeated dropblock(out) calls (fresh randnoise
            # per call, dropblock.py:55)
            if not dropblock_on:
                return h
            return drop_block(
                h,
                self.make_rng("dropblock"),
                block_size=self.dropblock_size,
                keep_prob=db_keep,
            )

        def act(h, name, channels):
            if self.dy_relu is not None:
                return DyReLU(
                    channels, self.dy_relu, dtype=self.dtype, name=name
                )(h)
            return nn.relu(h)

        if self.version == "d":
            # cls_resnetD.py PreActBottleneck (:95-121): act0 on the
            # block input, downsample fed from act0's output, dropblock
            # after every conv and on the residual, SE before the add,
            # and bn3 applied AFTER the residual sum
            out = act(x, "act0", x.shape[-1])
            shortcut = x
            if needs_proj:
                s_in = out
                if self.avg_down and self.stride > 1:
                    # AvgPool(k=stride, s=stride, ceil_mode,
                    # count_include_pad=False) + 1x1 conv + BN
                    # (cls_resnetD.py:240-258)
                    s_in = nn.avg_pool(
                        out,
                        (self.stride, self.stride),
                        strides=(self.stride, self.stride),
                        padding="SAME",
                        count_include_pad=False,
                    )
                    shortcut = conv(self.out_channels, 1, 1, "downsample")(
                        s_in
                    )
                else:
                    shortcut = conv(
                        self.out_channels, 1, self.stride, "downsample"
                    )(s_in)
                shortcut = apply_norm(shortcut, "bn_down")
            h = db(conv(width, 1, 1, "conv1")(out))
            h = act(apply_norm(h, "bn1"), "act1", width)
            h = db(conv(width, 3, self.stride, "conv2", self.cardinality)(h))
            h = act(apply_norm(h, "bn2"), "act2", width)
            h = db(conv(self.out_channels, 1, 1, "conv3")(h))
            if self.se_ratio > 0:
                h = SqueezeExcite(
                    self.out_channels, self.se_ratio, dtype=self.dtype,
                    name="se",
                )(h)
            shortcut = db(shortcut)
            return apply_norm(h + shortcut, "bn3")

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
        h = db(nn.relu(apply_norm(h, "bn1")))
        h = conv(width, 3, self.stride, "conv2", self.cardinality)(h)
        h = db(nn.relu(apply_norm(h, "bn2")))
        h = conv(self.out_channels, 1, 1, "conv3")(h)
        h = db(apply_norm(h, "bn3"))
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
        shortcut = db(shortcut)
        out = shortcut + h
        return nn.relu(out) if self.with_relu else out


class ResNet(nn.Module):
    """ResNet-{50,101,152} / ResNeXt / SE / -D / v2 / resnetD('d') /
    resnetP(proj_dims), NHWC."""

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
    stem_kernel: int = 7  # cls_resnetD KERNEL_SIZE_STEM (7 or 3)
    avg_down: bool = False
    frozen_bn: bool = False
    norm: str = "bn"  # 'bn' | 'gn' | 'frozen'
    weight_standardization: bool = False
    with_relu: bool = True  # MODEL.SPEC.WITH_RELU (cls_resnetP.py:185)
    # cls_resnetP.py DIMS_PROJ: Linear projection chain between the
    # pooled feature and the head (cls_resnetP.py:202-224); dropout
    # interleaves when SPEC.DROPOUT > 0
    proj_dims: Sequence[int] = ()
    proj_dropout: float = 0.0
    # MODEL.SPEC.DY_RELU: DYReLU2 replaces ReLU ('d' version only, like
    # cls_resnetD)
    dy_relu: Optional[DyReLUSpec] = None
    # AUG.DROPBLOCK_LAYERS / _KEEP_PROB / _BLOCK_SIZE (cls_resnet.py:
    # 409-419); stages are 1-indexed
    dropblock_stages: Sequence[int] = ()
    dropblock_keep_prob: float = 1.0
    dropblock_block_size: int = 7
    bn_axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        progress=1.0,
    ) -> jax.Array:
        train = not deterministic
        kind = "frozen" if self.frozen_bn else self.norm
        conv_cls = StdConv if self.weight_standardization else nn.Conv
        x = x.astype(self.dtype)

        def stem_norm(h, name):
            m = _norm(kind, name, self.dtype, self.bn_axis_name)
            return m(h) if kind in (True, "frozen") else m(
                h, use_running_average=not train
            )

        def stem_act(h, name, channels):
            if self.version == "d" and self.dy_relu is not None:
                return DyReLU(
                    channels, self.dy_relu, dtype=self.dtype, name=name
                )(h)
            return nn.relu(h)

        def stem_conv(ch, k, s, name):
            return conv_cls(
                ch,
                (k, k),
                strides=(s, s),
                padding=[(k // 2, k // 2)] * 2,
                use_bias=False,
                name=name,
                dtype=self.dtype,
            )

        if self.version == "d":
            # cls_resnetD stems (:142-170, forward :263-282): deep =
            # three 3x3 convs strided 2/1/2, NO maxpool; kernel-3 = two
            # 3x3 convs strided 2/2.  (The reference's kernel-7 'd'
            # forward references an undefined bn2 and cannot run —
            # cls_resnetD.py:273-276; we implement the evident intent:
            # conv7-bn-act-maxpool.)
            if self.deep_stem:
                x = stem_conv(self.width // 2, 3, 2, "stem_conv1")(x)
                x = stem_act(
                    stem_norm(x, "stem_bn1"), "stem_act1", self.width // 2
                )
                x = stem_conv(self.width, 3, 1, "stem_conv2")(x)
                x = stem_act(
                    stem_norm(x, "stem_bn2"), "stem_act2", self.width
                )
                x = stem_conv(self.width, 3, 2, "stem_conv3")(x)
                x = stem_norm(x, "stem_bn3")
            elif self.stem_kernel == 3:
                x = stem_conv(self.width, 3, 2, "stem_conv1")(x)
                x = stem_act(
                    stem_norm(x, "stem_bn1"), "stem_act1", self.width
                )
                x = stem_conv(self.width, 3, 2, "stem_conv2")(x)
                x = stem_norm(x, "stem_bn2")
            else:
                x = stem_conv(self.width, 7, 2, "conv1")(x)
                x = stem_act(stem_norm(x, "bn1"), "stem_act1", self.width)
                x = nn.max_pool(
                    x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
                )
        elif self.deep_stem:
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
        if self.version != "d":
            # the 'd' stems own their downsampling (no trailing maxpool)
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )

        ch = self.width * 4
        for si, depth in enumerate(self.layers):
            stage_se = (
                self.se_ratio
                if (self.se_stages is None or self.se_stages[si])
                else 0.0
            )
            # per-stage DropBlock target, linearly annealed by training
            # progress (cls_resnet.py:409-419 + dropblock.py:29-30)
            stage_db = (si + 1) in tuple(self.dropblock_stages) and (
                self.dropblock_keep_prob < 1.0
            )
            db_keep = (
                scheduled_keep_prob(
                    stage_keep_prob(self.dropblock_keep_prob, si + 1),
                    progress,
                )
                if stage_db
                else None
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
                    with_relu=self.with_relu,
                    dy_relu=self.dy_relu if self.version == "d" else None,
                    use_dropblock=stage_db,
                    dropblock_size=self.dropblock_block_size,
                    bn_axis_name=self.bn_axis_name,
                    name=f"layer{si + 1}_block{bi}",
                    dtype=self.dtype,
                )(x, train, db_keep)
            ch *= 2

        if self.version == "v2":
            m = _norm(kind, "bn_final", self.dtype, self.bn_axis_name)
            x = m(x) if kind in (True, "frozen") else m(
                x, use_running_average=not train
            )
            x = nn.relu(x)
        elif self.version == "d":
            # cls_resnetD.py:183-185 ``final`` activation — the 'd'
            # blocks end un-activated (bn3 after the add), so the last
            # stage output gets one act before pooling
            if self.dy_relu is not None:
                x = DyReLU(
                    x.shape[-1], self.dy_relu, dtype=self.dtype,
                    name="final_act",
                )(x)
            else:
                x = nn.relu(x)
        feats = x.mean(axis=(1, 2))
        # cls_resnetP.py:202-224 projection chain (DIMS_PROJ); dropout
        # interleaves when SPEC.DROPOUT > 0
        for pi, dim in enumerate(tuple(self.proj_dims)):
            if self.proj_dropout > 0:
                feats = nn.Dropout(self.proj_dropout)(
                    feats, deterministic=not train
                )
            feats = nn.Dense(
                int(dim), name=f"proj{pi + 1}", dtype=self.dtype
            )(feats)
        return feats


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

"""TTNet v2/v3 — ShuffleNet-v2-style mobile backbones.

Reference: full_shot/main/lib/models/cls_ttnet_v2.py:1-311 (hardcoded
MobileShuffleV2Net) and cls_ttnet_v3.py:1-368 (config-driven TTNetV3).
No experiment yaml in the release references either file (the VERDICT-r3
documented exclusion), and cls_ttnet_v2's ``init_weights`` references an
``os`` module the file never imports, so its shipped ``get_cls_model``
entry point raises NameError — the model CLASS is executable and is what
the refexec fixture pins (tests/golden/generate_ttnet_from_reference.py).

Design notes (NHWC throughout):

* every block is the ShuffleNet-v2 InvertedResidual with a 1x1-BN-ReLU /
  k x k depthwise-BN-ReLU / 1x1-BN branch; v2 hardcodes k=5 (the
  reference's comments say conv3x3 — the code says 5), v3 takes k per
  stage from MODEL.EXTRA.STAGES.KERNEL_SIZE.
* block types (cls_ttnet_v2.py:62-167): 1 = bottom (branch on the whole
  input, concat with the untouched input), 2 = downsample (split in
  half, both halves get branches), 3 = normal (split, branch the first
  half, pass the second).  Outputs channel-shuffled with groups=2 and a
  mini_size=4 sub-grouping (:25-40 — NOT plain ShuffleNet shuffle).
* cls_ttnet_v2 hardcodes ``nn.Linear(1024, 1000)`` regardless of
  cfg.MODEL.NUM_CLASSES (:251) — reproduced via the default
  ``num_classes=1000`` (overridable, unlike the reference).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def channel_shuffle(
    x: jax.Array, groups: int, mini_size: int = 4
) -> jax.Array:
    """cls_ttnet_v2.py:25-40 in NHWC: channel c = g*cpg + m*mini + s is
    moved to c' = m*groups*mini + g*mini + s (transpose of the group and
    mini-group axes of the channel index)."""
    b, h, w, c = x.shape
    cpg = c // groups
    mn = cpg // mini_size
    x = x.reshape(b, h, w, groups, mn, mini_size)
    x = x.transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(b, h, w, c)


def channel_unshuffle(
    x: jax.Array, groups: int, mini_size: int = 4
) -> jax.Array:
    """Inverse permutation (cls_ttnet_v2.py:43-58; dead code in the
    reference's forward, kept for converter completeness)."""
    b, h, w, c = x.shape
    cpg = c // groups
    mn = cpg // mini_size
    x = x.reshape(b, h, w, mn, groups, mini_size)
    x = x.transpose(0, 1, 2, 4, 3, 5)
    return x.reshape(b, h, w, c)


class _Branch(nn.Module):
    """pw 1x1 -> BN -> relu -> dw k x k (stride) -> BN -> relu ->
    pw 1x1 -> BN (no final relu) — one InvertedResidual branch."""

    neck: int
    out: int
    stride: int
    kernel: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=name,
                dtype=self.dtype,
            )(h)

        x = nn.Conv(
            self.neck, (1, 1), use_bias=False, name="conv1",
            dtype=self.dtype,
        )(x)
        x = nn.relu(bn(x, "bn1"))
        x = nn.Conv(
            self.neck,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2,) * 2] * 2,
            feature_group_count=self.neck,
            use_bias=False,
            name="conv2",
            dtype=self.dtype,
        )(x)
        x = nn.relu(bn(x, "bn2"))
        x = nn.Conv(
            self.out, (1, 1), use_bias=False, name="conv3",
            dtype=self.dtype,
        )(x)
        return bn(x, "bn3")


class TTNetBlock(nn.Module):
    """InvertedResidual (cls_ttnet_v2.py:62-167 / cls_ttnet_v3.py:84-230)."""

    channel_in: int
    channel_out: int
    channel_neck: int
    stride: int = 1
    block_type: int = 3  # 1 bottom | 2 downsample | 3 normal
    mini_size: int = 4
    kernel: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cin, cout = self.channel_in, self.channel_out
        if self.block_type == 1:
            assert self.stride == 1
            b1 = _Branch(
                self.channel_neck, cout - cin, self.stride, self.kernel,
                name="branch1", dtype=self.dtype,
            )(x, train)
            out = jnp.concatenate([b1, x], axis=-1)
        elif self.block_type == 2:
            half = cin // 2
            x1, x2 = x[..., :half], x[..., half:]
            b1 = _Branch(
                self.channel_neck, cout - cin, self.stride, self.kernel,
                name="branch1", dtype=self.dtype,
            )(x1, train)
            b2 = _Branch(
                self.channel_neck, cin, self.stride, self.kernel,
                name="branch2", dtype=self.dtype,
            )(x2, train)
            out = jnp.concatenate([b1, b2], axis=-1)
        elif self.block_type == 3:
            assert self.stride == 1
            half = cin // 2
            x1, x2 = x[..., :half], x[..., half:]
            b1 = _Branch(
                self.channel_neck, cout - half, self.stride, self.kernel,
                name="branch1", dtype=self.dtype,
            )(x1, train)
            out = jnp.concatenate([b1, x2], axis=-1)
        else:
            raise ValueError(f"unsupported block type {self.block_type}")
        return channel_shuffle(out, 2, self.mini_size)


def _conv_bn_relu(x, features, kernel, stride, name, dtype, train):
    x = nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2,) * 2] * 2,
        use_bias=False,
        name=f"{name}_conv",
        dtype=dtype,
    )(x)
    x = nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        name=f"{name}_bn",
        dtype=dtype,
    )(x)
    return nn.relu(x)


class _Stage(nn.Module):
    """One stage: a stride-2 type-2 block then type-3 repeats
    (ShuffleBaseNet loop / TTNetV3._build_one_stage)."""

    channel_in: int
    channel_out: int
    repeats: int
    kernel: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = TTNetBlock(
            self.channel_in,
            self.channel_out,
            self.channel_in,
            stride=2,
            block_type=2,
            kernel=self.kernel,
            name="block_0",
            dtype=self.dtype,
        )(x, train)
        for i in range(1, self.repeats):
            x = TTNetBlock(
                self.channel_out,
                self.channel_out,
                self.channel_out,
                stride=1,
                block_type=3,
                kernel=self.kernel,
                name=f"block_{i}",
                dtype=self.dtype,
            )(x, train)
        return x


class TTNetV2(nn.Module):
    """cls_ttnet_v2.py MobileShuffleV2Net (hardcoded topology).

    conv1 3->8 s2; bottom block 8->16 (neck 16); stages [32, 64, 128,
    1024] x repeats [3, 5, 10, 5]; global avg pool; fc (the reference
    hardcodes Linear(1024, 1000))."""

    num_classes: int = 1000
    features_only: bool = False  # backbone contract (ImageClassifier)
    dtype: Dtype = jnp.float32

    STAGE_CHANNELS = (32, 64, 128, 1024)
    STAGE_REPEATS = (3, 5, 10, 5)

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        train = not deterministic
        x = _conv_bn_relu(
            x.astype(self.dtype), 8, 3, 2, "conv1", self.dtype, train
        )
        x = TTNetBlock(
            8, 16, 16, stride=1, block_type=1, kernel=5,
            name="block1", dtype=self.dtype,
        )(x, train)
        cin = 16
        for i, (cout, reps) in enumerate(
            zip(self.STAGE_CHANNELS, self.STAGE_REPEATS), start=1
        ):
            x = _Stage(
                cin, cout, reps, kernel=5, name=f"stage_{i}",
                dtype=self.dtype,
            )(x, train)
            cin = cout
        x = jnp.mean(x, axis=(1, 2))
        if self.features_only:
            return x
        return nn.Dense(self.num_classes, name="fc", dtype=self.dtype)(x)


class TTNetV3(nn.Module):
    """cls_ttnet_v3.py TTNetV3: config-driven stem/stages + 1x1-BN-relu
    neck + fc head."""

    num_classes: int
    stem_kickoff: int = 8
    stem_start: int = 16
    stem_expand: int = 2
    stem_kernel: int = 3
    stage_channels: Sequence[int] = (32, 64, 128)
    stage_repeats: Sequence[int] = (3, 5, 10)
    stage_kernels: Sequence[int] = (3, 3, 3)
    channel_final: int = 1024
    features_only: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        train = not deterministic
        x = _conv_bn_relu(
            x.astype(self.dtype), self.stem_kickoff, 3, 2, "stem",
            self.dtype, train,
        )
        x = TTNetBlock(
            self.stem_kickoff,
            self.stem_start,
            self.stem_kickoff * self.stem_expand,
            stride=1,
            block_type=1,
            kernel=self.stem_kernel,
            name="stem_block",
            dtype=self.dtype,
        )(x, train)
        cin = self.stem_start
        for i, (cout, reps, k) in enumerate(
            zip(self.stage_channels, self.stage_repeats,
                self.stage_kernels),
            start=1,
        ):
            x = _Stage(
                cin, cout, reps, kernel=int(k), name=f"stage_{i}",
                dtype=self.dtype,
            )(x, train)
            cin = cout
        x = _conv_bn_relu(
            x, self.channel_final, 1, 1, "final", self.dtype, train
        )
        x = jnp.mean(x, axis=(1, 2))
        if self.features_only:
            return x
        return nn.Dense(self.num_classes, name="fc", dtype=self.dtype)(x)


def ttnet_v3_from_config(cfg, num_classes: int, dtype=jnp.float32,
                         features_only: bool = False):
    """Build TTNetV3 from the reference MODEL.EXTRA surface
    (cls_ttnet_v3.py:249-287: STEM.{NUM_CHANNEL_KICKOFF,
    NUM_CHANNEL_STEM_START, EXPAND_STEM_START, KERNEL_SIZE},
    STAGES.{NUM_CHANNEL_OUTPUT, NUM_BLOCK_REPEATS, KERNEL_SIZE},
    NUM_CHANNEL_FINAL)."""
    extra = cfg.MODEL.EXTRA
    stem = extra.STEM
    stages = extra.STAGES
    return TTNetV3(
        num_classes=num_classes,
        stem_kickoff=int(stem.NUM_CHANNEL_KICKOFF),
        stem_start=int(stem.NUM_CHANNEL_STEM_START),
        stem_expand=int(stem.EXPAND_STEM_START),
        stem_kernel=int(stem.KERNEL_SIZE),
        stage_channels=tuple(stages.NUM_CHANNEL_OUTPUT),
        stage_repeats=tuple(stages.NUM_BLOCK_REPEATS),
        stage_kernels=tuple(stages.KERNEL_SIZE),
        channel_final=int(extra.NUM_CHANNEL_FINAL),
        features_only=features_only,
        dtype=dtype,
    )

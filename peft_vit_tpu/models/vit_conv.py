"""ViT variants with residual attention scores and conv token mixers.

Covers two reference architectures that share these options:

* ``cls_vit_cswin.py`` — despite the filename, a PLAIN global-attention
  ViT: LePE depthwise-conv positional encoding on v (get_lepe, :82-89,
  get_v conv :79) plus an optional ``res_score`` chain that adds the
  previous block's attention scores to the current ones (:103-106).
  There is no cross-shaped window partitioning anywhere in the file (the
  true CSWin architecture was never ported into the reference).
* ``cls_vit_conv.py`` — blocks with optional attention / MLP / conv
  branches; the conv branch is the ``pw-glu-dw-bn-swish-pw`` mixer
  (:199-216) applied to the patch grid with a residual, optionally
  adding its pooled response to the cls token (ADD_CLS, :236-238).
  Config keys: USE_CLS_TOKEN, NORM_EMBED, HAS_ATTN/HAS_MLP/HAS_CONV,
  CONV_RATIO, RES_SCORE (experiments/imagenet/vit_conv/*.yaml).

TPU notes: res_score materializes (B, H, N, N) scores, so those models
use the XLA attention path (flash tiles never form the full matrix); the
conv mixer's BatchNorm contributes ``batch_stats`` handled by the
full-shot Trainer.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm, Mlp

Dtype = Any


class ConvMixer(nn.Module):
    """pw-glu-dw-bn-swish-pw grid mixer (cls_vit_conv.py:199-216)."""

    dim: int
    ratio: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: (B, H, W, D) patch grid
        dw = int(self.dim * self.ratio)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.Conv(dw, (1, 1), use_bias=False, name="pw1", **kw)(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Conv(
            dw,
            (3, 3),
            padding="SAME",
            feature_group_count=dw,
            use_bias=False,
            name="dw",
            **kw,
        )(h)
        h = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            name="bn",
            dtype=self.dtype,
        )(h)
        h = nn.swish(h)
        return nn.Conv(self.dim, (1, 1), use_bias=False, name="pw2", **kw)(h)


class ScoreAttention(nn.Module):
    """Global MHA with LePE and residual attention scores
    (cls_vit_cswin.py Attention:57-117)."""

    width: int
    heads: int
    grid_size: int
    n_prefix: int = 1
    lepe: bool = False
    res_score: bool = False
    # Reproduce the reference's EXECUTED q/k/v layout: cls_vit_cswin.py
    # :96-99 reshapes the already-permuted (3,B,N,C) qkvo buffer into
    # (B,N,3,H,hd), scrambling q/k/v across the batch, while get_lepe
    # still sees the clean v (qkvo[2]).  Same quirk as few_shot LePE.py
    # (PEFTSpec.lepe_ref_qkv); default False = clean intended semantics.
    ref_qkv_scramble: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, prev: Optional[jax.Array] = None):
        b, n, d = x.shape
        h = self.heads
        hd = d // h
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        qkv = nn.Dense(3 * d, use_bias=True, name="qkv", **kw)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        if self.ref_qkv_scramble:
            qkvo = jnp.transpose(qkv.reshape(b, n, 3, d), (2, 0, 1, 3))
            scr = jnp.transpose(
                qkvo.reshape(b, n, 3, h, hd), (2, 0, 3, 1, 4)
            )
            qh, kh, vh = scr[0], scr[1], scr[2]
        else:
            qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        scores = (
            jnp.einsum(
                "bhnd,bhmd->bhnm",
                qh,
                kh,
                preferred_element_type=jnp.float32,
            )
            * hd**-0.5
        )
        if self.res_score and prev is not None:
            scores = scores + prev
        new_prev = scores if self.res_score else None
        attn = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)

        if self.lepe:
            g = self.grid_size
            vp = v[:, self.n_prefix :, :].reshape(b, g, g, d)
            lepe = nn.Conv(
                d,
                kernel_size=(3, 3),
                padding="SAME",
                feature_group_count=d,
                name="get_v",
                **kw,
            )(vp).reshape(b, g * g, d)
            out = out.at[:, self.n_prefix :, :].add(lepe)

        out = nn.Dense(d, name="out_proj", **kw)(out)
        return out, new_prev


class ConvViTBlock(nn.Module):
    width: int
    heads: int
    grid_size: int
    mlp_ratio: float = 4.0
    n_prefix: int = 1
    has_attn: bool = True
    has_mlp: bool = True
    has_conv: bool = False
    add_cls: bool = False
    conv_ratio: float = 1.0
    lepe: bool = False
    res_score: bool = False
    ref_qkv_scramble: bool = False
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        prev: Optional[jax.Array] = None,
        deterministic: bool = True,
    ):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.has_attn:
            attn, prev = ScoreAttention(
                self.width,
                self.heads,
                self.grid_size,
                n_prefix=self.n_prefix,
                lepe=self.lepe,
                res_score=self.res_score,
                ref_qkv_scramble=self.ref_qkv_scramble,
                name="attn",
                **kw,
            )(LayerNorm(name="ln_1", param_dtype=self.param_dtype)(x), prev)
            x = x + self._drop_path(attn, deterministic)

        if self.has_mlp:
            m = Mlp(
                self.width,
                int(self.width * self.mlp_ratio),
                act="gelu",
                name="mlp",
                **kw,
            )(LayerNorm(name="ln_2", param_dtype=self.param_dtype)(x))
            x = x + self._drop_path(m, deterministic)

        if self.has_conv:
            g = self.grid_size
            b, n, d = x.shape
            x_ln = LayerNorm(name="ln_3", param_dtype=self.param_dtype)(x)
            grid = x_ln[:, self.n_prefix :, :].reshape(b, g, g, d)
            res = ConvMixer(
                d, self.conv_ratio, name="conv", **kw
            )(grid, train=not deterministic)
            res = self._drop_path(res, deterministic)
            new_grid = (grid + res).reshape(b, g * g, d)
            if self.n_prefix > 0:
                cls = x_ln[:, : self.n_prefix, :]
                if self.add_cls:
                    cls = cls + res.mean(axis=(1, 2), keepdims=False)[
                        :, None, :
                    ]
                x = jnp.concatenate([cls, new_grid], axis=1)
            else:
                x = new_grid

        return x, prev

    def _drop_path(self, t, deterministic):
        if self.drop_path == 0.0 or deterministic:
            return t
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        shape = (t.shape[0],) + (1,) * (t.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return t * mask.astype(t.dtype) / keep


class ConvViT(nn.Module):
    """Returns pooled features (cls token, or mean when use_cls_token is
    False — cls_vit_cswin.py:419-423)."""

    image_size: int = 224
    patch_size: int = 16
    width: int = 384
    layers: int = 8
    heads: int = 6
    mlp_ratio: float = 4.0
    use_cls_token: bool = True
    norm_embed: bool = False
    has_attn: bool = True
    has_mlp: bool = True
    has_conv: bool = False
    add_cls: bool = False
    conv_ratio: float = 1.0
    lepe: bool = False
    res_score: bool = False
    ref_qkv_scramble: bool = False
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        b = x.shape[0]
        g = self.grid_size
        w = self.width
        x = nn.Conv(
            w,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="patch_embed",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x.astype(self.dtype))
        x = x.reshape(b, g * g, w)
        if self.norm_embed:
            x = LayerNorm(name="norm_embed", param_dtype=self.param_dtype)(x)

        n_prefix = 0
        if self.use_cls_token:
            cls = self.param(
                "cls_token", nn.initializers.zeros, (w,), self.param_dtype
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, w)), x],
                axis=1,
            )
            n_prefix = 1
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (g * g + n_prefix, w),
            self.param_dtype,
        )
        x = x + pos.astype(self.dtype)[None]

        prev = None
        dpr = np.linspace(0.0, self.drop_path_rate, max(self.layers, 1))
        for i in range(self.layers):
            x, prev = ConvViTBlock(
                w,
                self.heads,
                g,
                mlp_ratio=self.mlp_ratio,
                n_prefix=n_prefix,
                has_attn=self.has_attn,
                has_mlp=self.has_mlp,
                has_conv=self.has_conv,
                add_cls=self.add_cls and self.use_cls_token,
                conv_ratio=self.conv_ratio,
                lepe=self.lepe,
                res_score=self.res_score,
                ref_qkv_scramble=self.ref_qkv_scramble,
                drop_path=float(dpr[i]),
                name=f"blocks_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, prev, deterministic)

        x = LayerNorm(name="ln_post", param_dtype=self.param_dtype)(x)
        if self.use_cls_token:
            return x[:, 0, :]
        return x.mean(axis=1)

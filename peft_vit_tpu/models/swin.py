"""Swin Transformer backbone.

Capability parity with the reference's Swin family
(few_shot/vision_benchmark/models/cls_swin.py:20-713 supervised Swin and
models/clip_swin.py:24-284 CLIP-with-Swin-visual), re-designed for TPU:

* window partition/merge are pure reshapes (static shapes, XLA-fusable)
* window attention runs through the same ops.attention dispatcher as the
  ViT (Pallas flash kernel with the additive relative-position-bias +
  shift mask folded into one bias tensor)
* the same PEFT hooks apply: the supervised RPB method trains exactly the
  ``relative_position_bias_table`` leaves (mask 'rpb'), LoRA injects into
  the window-attention qkv.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import multi_head_attention
from ..peft.spec import PEFTSpec
from .layers import ACT2FN, LayerNorm, bert_init, _rpb_index

Dtype = Any


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_merge(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (Swin paper Fig. 4):
    (nW, ws*ws, ws*ws) additive {-1e9, 0}."""
    img = np.zeros((1, h, w, 1))
    cnt = 0
    for hs in (
        slice(0, -ws),
        slice(-ws, -shift),
        slice(-shift, None),
    ):
        for wsl in (
            slice(0, -ws),
            slice(-ws, -shift),
            slice(-shift, None),
        ):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    # pure numpy (NOT window_partition): jnp ops on constants yield
    # tracers inside jit, and this mask is static — routing it through
    # jnp made Swin un-jittable with shifted windows (caught by the
    # round-4 bench matrix; eager tests never jit the full model)
    win = (
        img.reshape(1, h // ws, ws, w // ws, ws, 1)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(-1, ws * ws)
    )
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff != 0, -1e9, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window_size: int
    spec: PEFTSpec = PEFTSpec()
    use_flash: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, mask: Optional[np.ndarray] = None
    ) -> jax.Array:
        """x: (B*nW, N, C); mask: (nW, N, N) static or None."""
        bnw, n, c = x.shape
        h = self.heads
        hd = c // h
        ws = self.window_size

        qkv = nn.Dense(
            3 * c,
            name="in_proj",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        if self.spec.attn_delta == "lora":
            scale = self.spec.lora_alpha / self.spec.lora_rank
            deltas = {}
            for t in self.spec.lora_targets:
                a = nn.Dense(
                    self.spec.lora_rank,
                    use_bias=False,
                    name=f"{t}_adapter1",
                    kernel_init=bert_init(),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(x)
                deltas[t] = (
                    nn.Dense(
                        c,
                        use_bias=False,
                        name=f"{t}_adapter2",
                        kernel_init=nn.initializers.zeros,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                    )(a)
                    * scale
                )
            q = q + deltas.get("q", 0.0)
            k = k + deltas.get("k", 0.0)
            v = v + deltas.get("v", 0.0)

        def split_heads(t):
            return t.reshape(bnw, n, h, hd).transpose(0, 2, 1, 3)

        # Swin always carries a relative position bias
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(stddev=0.02),
            ((2 * ws - 1) * (2 * ws - 1), h),
            self.param_dtype,
        )
        idx = _rpb_index(ws)
        bias = table[idx.reshape(-1)].reshape(n, n, h)
        bias = bias.transpose(2, 0, 1).astype(jnp.float32)  # (h, N, N)

        if mask is not None:
            nw = mask.shape[0]
            b = bnw // nw
            # fold the window mask into the bias per window group: run
            # attention with batch = (b, nw) folded and bias per (nw, h)
            xm = (
                jnp.asarray(mask, jnp.float32)[None, :, None]
                + bias[None, None]
            )  # (1, nw, h, N, N)
            qh = split_heads(q).reshape(b, nw, h, n, hd)
            kh = split_heads(k).reshape(b, nw, h, n, hd)
            vh = split_heads(v).reshape(b, nw, h, n, hd)
            out = multi_head_attention(
                qh.reshape(b, nw * h, n, hd),
                kh.reshape(b, nw * h, n, hd),
                vh.reshape(b, nw * h, n, hd),
                bias=jnp.broadcast_to(
                    xm, (1, nw, h, n, n)
                ).reshape(nw * h, n, n).astype(self.dtype),
                use_flash=None if self.use_flash else False,
            )
            out = out.reshape(b, nw, h, n, hd).reshape(bnw, h, n, hd)
        else:
            out = multi_head_attention(
                split_heads(q),
                split_heads(k),
                split_heads(v),
                bias=bias.astype(self.dtype),
                use_flash=None if self.use_flash else False,
            )
        out = out.transpose(0, 2, 1, 3).reshape(bnw, n, c)
        return nn.Dense(
            c,
            name="out_proj",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    input_resolution: Tuple[int, int]
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    spec: PEFTSpec = PEFTSpec()
    use_flash: bool = True
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _drop_path(self, t, deterministic):
        if self.drop_path == 0.0 or deterministic:
            return t
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (t.shape[0], 1, 1))
        return t * mask.astype(t.dtype) / keep

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        """x: (B, H*W, C)."""
        hres, wres = self.input_resolution
        b, n, c = x.shape
        ws = min(self.window_size, hres, wres)
        shift = self.shift if ws < min(hres, wres) else 0

        shortcut = x
        y = LayerNorm(name="ln_1", param_dtype=self.param_dtype)(x)
        y = y.reshape(b, hres, wres, c)
        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        windows = window_partition(y, ws)
        mask = (
            _shift_attn_mask(hres, wres, ws, shift) if shift > 0 else None
        )
        attn = WindowAttention(
            c,
            self.heads,
            ws,
            spec=self.spec,
            use_flash=self.use_flash,
            name="attn",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(windows, mask)
        y = window_merge(attn, ws, hres, wres)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + self._drop_path(y.reshape(b, n, c), deterministic)

        m = LayerNorm(name="ln_2", param_dtype=self.param_dtype)(x)
        m = nn.Dense(
            int(c * self.mlp_ratio),
            name="mlp_fc1",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(m)
        m = ACT2FN["gelu"](m)
        m = nn.Dense(
            c,
            name="mlp_fc2",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(m)
        return x + self._drop_path(m, deterministic)


class PatchMerging(nn.Module):
    input_resolution: Tuple[int, int]
    dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h, w = self.input_resolution
        b, n, c = x.shape
        # official concat order [x0, x1, x2, x3] = (dh,dw) of (0,0),
        # (1,0), (0,1), (1,1) (cls_swin.py:325-329) — i.e. the H offset
        # varies FASTEST within the 4c axis; pinned by refexec_swin.npz
        # (loading official Swin weights needs this exact order)
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(
            b, (h // 2) * (w // 2), 4 * c
        )
        x = LayerNorm(name="norm", param_dtype=self.param_dtype)(x)
        return nn.Dense(
            2 * c,
            use_bias=False,
            name="reduction",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class SwinTransformer(nn.Module):
    """Swin backbone; returns pooled features (pre-head)."""

    image_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    output_dim: Optional[int] = None  # CLIP-Swin projection
    spec: PEFTSpec = PEFTSpec()
    use_flash: bool = True
    # SSL-Swin options (ssl_swin.py:600-653): absolute position embedding,
    # patch-embed norm toggle, stochastic depth (teacher variant uses 0)
    ape: bool = False
    patch_norm: bool = True
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        n_last_blocks: int = 0,
    ) -> jax.Array:
        """n_last_blocks > 0: return the concatenation of the avg-pooled
        features of the last n blocks (the SSL linear-eval protocol,
        ssl_swin.py forward_return_n_last_blocks:775-814; only last-stage
        blocks get the final norm, matching :803-805)."""
        b = x.shape[0]
        g = self.image_size // self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            name="patch_embed",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x.astype(self.dtype))
        x = x.reshape(b, g * g, self.embed_dim)
        if self.patch_norm:
            x = LayerNorm(name="pos_norm", param_dtype=self.param_dtype)(x)
        if self.ape:
            pos = self.param(
                "absolute_pos_embed",
                nn.initializers.normal(stddev=0.02),
                (g * g, self.embed_dim),
                self.param_dtype,
            )
            x = x + pos.astype(self.dtype)[None]

        total_blocks = sum(self.depths)
        dpr = np.linspace(0.0, self.drop_path_rate, max(total_blocks, 1))
        final_norm = LayerNorm(name="norm", param_dtype=self.param_dtype)
        block_feats = []  # avg-pooled per block (for n_last_blocks)
        blk_idx = 0
        res = g
        dim = self.embed_dim
        last_stage = len(self.depths) - 1
        for si, (depth, heads) in enumerate(
            zip(self.depths, self.num_heads)
        ):
            for bi in range(depth):
                x = SwinBlock(
                    dim,
                    heads,
                    (res, res),
                    window_size=self.window_size,
                    shift=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    spec=self.spec,
                    use_flash=self.use_flash,
                    drop_path=float(dpr[blk_idx]),
                    name=f"stage{si}_block{bi}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(x, deterministic)
                blk_idx += 1
                if n_last_blocks > 0 and blk_idx > total_blocks - n_last_blocks:
                    # the final norm applies only to last-stage features
                    # (shared weights with the head norm; :803-805)
                    feat = final_norm(x) if si == last_stage else x
                    block_feats.append(feat.mean(axis=1))
            if si < len(self.depths) - 1:
                x = PatchMerging(
                    (res, res),
                    dim,
                    name=f"downsample{si}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(x)
                res //= 2
                dim *= 2

        if n_last_blocks > 0:
            return jnp.concatenate(block_feats, axis=-1)
        x = final_norm(x)
        pooled = x.mean(axis=1)
        if self.output_dim is not None:
            proj = self.param(
                "proj",
                nn.initializers.normal(stddev=dim**-0.5),
                (dim, self.output_dim),
                self.param_dtype,
            )
            pooled = pooled @ proj.astype(self.dtype)
        return pooled

"""The one Vision Transformer.

Serves both backbone families of the reference with a single implementation:

* CLIP visual tower (reference evaluation/adapter_model.py:345-418 and
  siblings): conv1 patch embed (no bias), class_embedding, positional
  embedding, ln_pre, QuickGELU blocks, ln_post on the cls token, projection.
* supervised timm-style ViT (reference evaluation/lora.py / full_shot
  lib/models/cls_vit.py:57-443): biased patch embed, GELU blocks, final
  norm; the classification head lives in ``models.classifier``.

PEFT injection is entirely via ``peft.PEFTSpec`` (see models/layers.py).
Extra capabilities beyond the per-block hooks:

* VPT prompt tokens (shallow/deep) — north-star extension (SURVEY §2.2 note).
* ``extra_block`` — the reference "transformer probe": a (depth+1)-th
  trainable block (transformer_classifier.py:338-347), here named
  ``blocks_{layers}`` so the reference's ``'blocks.12'`` filter maps to
  ``blocks_12``.

Inputs are NHWC (TPU-native layout).  Checkpoint converters transpose from
torch NCHW (models/convert.py).

``scan_layers=True`` compiles the block body ONCE via nn.scan (stacked
(L, ...) params) instead of unrolling L copies — a large compile-time win
(XLA compiles over a slow remote channel in some deployments).  Scan is
used automatically when the spec has no per-layer statics (no AdapterDrop
layer subset, no deep prompts, no extra probe block, no per-layer
drop-path); layer-indexed trainable filters (first_attention,
transformer_probe) require the unrolled form.  ``models.convert.
stack_flat_blocks`` restacks unrolled checkpoints.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..peft.spec import PEFTSpec
from .layers import Block, LayerNorm

Dtype = Any


class _BlockCell(nn.Module):
    """Scan cell: one Block body, (carry, broadcast-in) -> (carry, None)."""

    width: int
    heads: int
    mlp_ratio: float
    act: str
    spec: PEFTSpec
    grid_size: int
    n_prefix: int
    use_flash: bool
    softmax_fp32: bool
    remat: bool
    ln_fp32: bool
    int8: bool
    int8_train: bool
    int8_attn: bool
    int8_attn_pv: bool
    int8_targets: tuple
    attn_batch_chunk: int
    dtype: Dtype
    param_dtype: Dtype

    @nn.compact
    def __call__(self, x, deterministic):
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))
        x = block_cls(
            self.width,
            self.heads,
            mlp_ratio=self.mlp_ratio,
            act=self.act,
            spec=self.spec,
            layer_idx=0,
            grid_size=self.grid_size,
            n_prefix=self.n_prefix,
            use_flash=self.use_flash,
            softmax_fp32=self.softmax_fp32,
            int8=self.int8,
            int8_train=self.int8_train,
            int8_attn=self.int8_attn,
            int8_attn_pv=self.int8_attn_pv,
            int8_targets=self.int8_targets,
            attn_batch_chunk=self.attn_batch_chunk,
            drop_path=0.0,
            ln_fp32=self.ln_fp32,
            name="block",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x, deterministic)
        return x, None


class _PatchEmbedGEMM(nn.Module):
    """Patchify as an MXU GEMM (TPU.PATCH_EMBED_GEMM).

    XLA lowers the strided patch conv with C_in=3 onto the MXU at ~18
    TF/s (3 of 128 lanes carry data) plus a layout copy of the input
    image — together ~7% of the LoRA train step at B=16 (BASELINE.md
    round-3 xprof).  The same contraction expressed as a dot_general
    over the (patch, patch, C) axes is a K=patch*patch*C GEMM — a
    shape the MXU runs at full rate.  Param tree is identical to the
    conv module ("kernel" (P, P, C, width), optional "bias"), so
    checkpoints and converters see no difference.
    """

    width: int
    patch: int
    use_bias: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        p = self.patch
        gh, gw = hh // p, ww // p
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (p, p, c, self.width),
            self.param_dtype,
        )
        xp = x.reshape(b, gh, p, gw, p, c)
        # contract (p, q, c) directly — no host-visible transpose; XLA
        # feeds the MXU with strided tiles instead of materializing the
        # (B, gh, gw, p, p, c) permutation
        out = jax.lax.dot_general(
            xp,
            kernel.astype(self.dtype),
            (((2, 4, 5), (0, 1, 2)), ((), ())),
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.initializers.zeros,
                (self.width,),
                self.param_dtype,
            )
            out = out + bias.astype(out.dtype)
        return out


class VisionTransformer(nn.Module):
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    style: str = "clip"  # 'clip' | 'timm'
    # cls_vit.py use_cls_tocken: False drops the class token (pos_embed
    # has g*g rows) and pools by token MEAN (:401-405) — required by the
    # RPB / LePE variants whose (g*g, g*g) bias cannot broadcast over a
    # cls row.  CLIP style always uses the class token.
    use_cls_token: bool = True
    output_dim: Optional[int] = None  # CLIP projection dim; None = width
    spec: PEFTSpec = PEFTSpec()
    use_flash: bool = True
    softmax_fp32: bool = True  # False = TPU.BF16_SOFTMAX fast path
    remat: bool = False
    drop_path_rate: float = 0.0
    ln_fp32: bool = True
    scan_layers: bool = False
    int8: bool = False  # int8 GEMMs on deterministic (no-grad) forwards
    # TPU.INT8_FWD_TRAIN: int8 GEMMs on training forwards with a
    # full-precision custom-vjp backward (QLoRA recipe, ops/int8.py)
    int8_train: bool = False
    # TPU.INT8_ATTN: the QK^T and PV dots also ride the int8 MXU using
    # statically-calibrated q/k/v scales (requires INT8_STATIC_ACT's
    # calibration machinery; ops/attention.int8_attention)
    int8_attn: bool = False
    # TPU.INT8_ATTN_PV: quantize the P@V dot too — measured UNSTABLE
    # in training (ops/attention.int8_attention docstring); opt-in
    # for measurement only
    int8_attn_pv: bool = False
    int8_targets: tuple = ("in_proj", "out_proj", "c_fc", "c_proj")
    patch_gemm: bool = False  # TPU.PATCH_EMBED_GEMM: patchify via MXU GEMM
    attn_batch_chunk: int = 0  # TPU.ATTN_BATCH_CHUNK: lax.map attention
    # TPU.SEQUENCE_PARALLEL: a PartitionSpec for the (B, N, C) inter-block
    # activations, e.g. P("data", "model", None) — Megatron-style sequence
    # parallelism: norms / residual adds / dropout run token-sharded over
    # the tensor axis, and GSPMD inserts the all-gather before attention's
    # QKV matmul and the reduce-scatter after the output projection (the
    # scaling-book recipe; requires tracing under a mesh context).
    act_sharding: Optional[Any] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _constrain(self, x: jax.Array) -> jax.Array:
        if self.act_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self.act_sharding)

    def _can_scan(self, start_layer: int, stop_layer) -> bool:
        spec = self.spec
        return (
            self.scan_layers
            and start_layer == 0
            and stop_layer is None
            and spec.adapter_layers is None
            and not spec.prompt_deep
            and not spec.extra_block
            and self.drop_path_rate == 0.0
        )

    @property
    def _use_cls(self) -> bool:
        return self.use_cls_token or self.style == "clip"

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool = True,
        return_tokens: bool = False,
        start_layer: int = 0,
        stop_layer: Optional[int] = None,
    ):
        """start_layer > 0: `x` is a token sequence (B, N, width) resuming
        after block `start_layer - 1` (the cached-backbone sweep path —
        frozen prefix activations computed once, suffix trained per cell).
        stop_layer = L: return tokens after block L-1, skipping the head.
        """
        b = x.shape[0]
        g = self.grid_size
        w = self.width
        spec = self.spec
        act = "quick_gelu" if self.style == "clip" else "gelu"

        if start_layer > 0:
            return self._blocks_and_head(
                x.astype(self.dtype),
                deterministic,
                return_tokens,
                start_layer,
                stop_layer,
                n_prefix=(1 if self._use_cls else 0)
                + (spec.prompt_tokens or 0),
            )

        x = x.astype(self.dtype)
        if self.patch_gemm:
            x = _PatchEmbedGEMM(
                w,
                patch=self.patch_size,
                use_bias=self.style != "clip",
                name="conv1",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        else:
            x = nn.Conv(
                w,
                kernel_size=(self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                use_bias=self.style != "clip",
                padding="VALID",
                name="conv1",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        x = x.reshape(b, g * g, w)

        n_prefix = 0
        if self._use_cls:
            cls_init = (
                nn.initializers.normal(stddev=w**-0.5)
                if self.style == "clip"
                else nn.initializers.zeros
            )
            class_embedding = self.param(
                "class_embedding", cls_init, (w,), self.param_dtype
            )
            cls = jnp.broadcast_to(
                class_embedding.astype(self.dtype), (b, 1, w)
            )
            x = jnp.concatenate([cls, x], axis=1)
            n_prefix = 1

        pos_init = (
            nn.initializers.normal(stddev=0.01)
            if self.style == "clip"
            else nn.initializers.normal(stddev=0.02)
        )
        pos = self.param(
            "positional_embedding",
            pos_init,
            (g * g + n_prefix, w),
            self.param_dtype,
        )
        x = x + pos.astype(self.dtype)[None]

        num_prompts = spec.prompt_tokens
        if num_prompts > 0:
            # VPT: prompts sit between cls and patch tokens; they carry no
            # positional embedding (VPT, Jia et al. 2022).
            prompts = self.param(
                "prompt_embeddings",
                nn.initializers.normal(stddev=0.02),
                (num_prompts, w),
                self.param_dtype,
            )
            pr = jnp.broadcast_to(
                prompts.astype(self.dtype), (b, num_prompts, w)
            )
            keep = 1 if self._use_cls else 0
            x = jnp.concatenate(
                [x[:, :keep], pr, x[:, keep:]], axis=1
            )
            n_prefix = keep + num_prompts

        x = self._constrain(x)
        if self.style == "clip":
            x = LayerNorm(
                name="ln_pre",
                param_dtype=self.param_dtype,
                compute_fp32=self.ln_fp32,
            )(x)

        return self._blocks_and_head(
            x, deterministic, return_tokens, 0, stop_layer, n_prefix
        )

    def _blocks_and_head(
        self,
        x: jax.Array,
        deterministic: bool,
        return_tokens: bool,
        start_layer: int,
        stop_layer: Optional[int],
        n_prefix: int,
    ):
        b = x.shape[0]
        g = self.grid_size
        w = self.width
        spec = self.spec
        act = "quick_gelu" if self.style == "clip" else "gelu"
        num_prompts = spec.prompt_tokens

        if stop_layer == 0 and start_layer == 0:
            # embed-only: tokens before any block (the pipeline-parallel
            # entry — parallel/pipeline.vit_pipeline_forward applies the
            # stacked blocks externally, then re-enters at start_layer=L)
            return x

        if self._can_scan(start_layer, stop_layer):
            scan_cls = nn.scan(
                _BlockCell,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.layers,
                in_axes=(nn.broadcast,),
            )
            x, _ = scan_cls(
                w,
                self.heads,
                self.mlp_ratio,
                act,
                spec,
                g,
                n_prefix,
                self.use_flash,
                self.softmax_fp32,
                self.remat,
                self.ln_fp32,
                self.int8,
                self.int8_train,
                self.int8_attn,
                self.int8_attn_pv,
                self.int8_targets,
                self.attn_batch_chunk,
                self.dtype,
                self.param_dtype,
                name="blocks",
            )(x, deterministic)
            return self._head(self._constrain(x), return_tokens)

        deep_prompts = None
        if num_prompts > 0 and spec.prompt_deep and self.layers > 1:
            deep_prompts = self.param(
                "deep_prompt_embeddings",
                nn.initializers.normal(stddev=0.02),
                (self.layers - 1, num_prompts, w),
                self.param_dtype,
            )

        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(2,))

        total_blocks = self.layers + (1 if spec.extra_block else 0)
        end = total_blocks if stop_layer is None else stop_layer
        dpr = np.linspace(0.0, self.drop_path_rate, max(total_blocks, 1))
        for i in range(start_layer, end):
            if deep_prompts is not None and 0 < i < self.layers:
                k0 = 1 if self._use_cls else 0
                x = x.at[:, k0 : k0 + num_prompts, :].set(
                    jnp.broadcast_to(
                        deep_prompts[i - 1].astype(self.dtype),
                        (b, num_prompts, w),
                    )
                )
            x = block_cls(
                w,
                self.heads,
                mlp_ratio=self.mlp_ratio,
                act=act,
                spec=spec,
                layer_idx=i,
                grid_size=g,
                n_prefix=n_prefix,
                use_flash=self.use_flash,
                softmax_fp32=self.softmax_fp32,
                int8=self.int8,
                int8_train=self.int8_train,
                int8_attn=self.int8_attn,
                int8_attn_pv=self.int8_attn_pv,
                int8_targets=self.int8_targets,
                attn_batch_chunk=self.attn_batch_chunk,
                drop_path=float(dpr[i]),
                ln_fp32=self.ln_fp32,
                name=f"blocks_{i}",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, deterministic)
            # sequence-parallel boundary: back to token-sharded after the
            # block's reduce-scatter point
            x = self._constrain(x)

        if stop_layer is not None:
            return x

        return self._head(x, return_tokens)

    def _head(self, x: jax.Array, return_tokens: bool):
        w = self.width
        if self.style == "clip":
            pooled = LayerNorm(
                name="ln_post",
                param_dtype=self.param_dtype,
                compute_fp32=self.ln_fp32,
            )(x[:, 0, :])
            if self.output_dim is not None:
                proj = self.param(
                    "proj",
                    nn.initializers.normal(stddev=w**-0.5),
                    (w, self.output_dim),
                    self.param_dtype,
                )
                pooled = pooled @ proj.astype(self.dtype)
        else:
            x = LayerNorm(
                name="ln_post",
                param_dtype=self.param_dtype,
                compute_fp32=self.ln_fp32,
            )(x)
            # cls_vit.py:401-405: cls token, or mean over all tokens
            pooled = (
                x[:, 0, :] if self._use_cls else jnp.mean(x, axis=1)
            )

        if return_tokens:
            return pooled, x
        return pooled

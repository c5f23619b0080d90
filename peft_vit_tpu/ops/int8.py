"""int8 weight+activation matmul for frozen-tower inference.

The reference's dominant probe workloads run a FROZEN backbone forward
(feature extraction / zero-shot / cached-backbone prefix,
few_shot/vision_benchmark/evaluation/feature.py:172-321).  The v5e MXU
executes s8xs8->s32 at 394 TOPS nominal vs 197 TF/s bf16 (measured 1.38x
in a dispatch-bound single-op harness, BASELINE.md round-2 probe), so
no-grad inference gets a near-free speedup from quantized GEMMs:

* weights: per-output-channel absmax scale (symmetric, no zero point)
* activations: per-token (per-row) dynamic absmax scale
* accumulate in int32 on the MXU, rescale in fp32

Quantizing the weight on the fly costs O(K*N) against the GEMM's
O(2*M*K*N) — <1% for any real batch — so the param pytree keeps its
fp32/bf16 layout and every existing checkpoint/PEFT path is untouched.

Training never routes through this op (jnp.round has a zero gradient);
the model gates it on ``deterministic`` (models/layers.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric absmax int8 over the LAST axis: (values_i8, scale)."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    return jnp.round(xf / scale).astype(jnp.int8), scale


def quantize_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel (axis 0 contracts) absmax int8: (w_i8, scale)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    return jnp.round(wf / scale).astype(jnp.int8), scale


def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """``x @ w`` over the last/first axes through the int8 MXU path.

    x: (..., K) any float dtype; w: (K, N).  Returns x.dtype (..., N).
    """
    x_i8, s_x = quantize_rows(x)
    w_i8, s_w = quantize_cols(w)
    acc = jax.lax.dot_general(
        x_i8,
        w_i8,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * s_x * s_w.reshape(
        (1,) * (x.ndim - 1) + (-1,)
    )
    return out.astype(x.dtype)


@jax.custom_vjp
def int8_matmul_bf16_bwd(x: jax.Array, w: jax.Array) -> jax.Array:
    """int8 MXU forward, full-precision backward (the QLoRA recipe).

    Forward is exactly :func:`int8_matmul` (s8xs8->s32 on the MXU);
    backward computes dx = g @ w^T and dw = x^T @ g with the ORIGINAL
    (bf16/fp32) weights and activations — ``jnp.round`` never enters the
    gradient, so PEFT deltas downstream/upstream of this matmul train
    exactly as if the layer were dense (straight-through estimator).

    Intended for the FROZEN tower's GEMMs under ``TPU.INT8_FWD_TRAIN``:
    w is a frozen param whose cotangent is never demanded, so XLA
    dead-code-eliminates the dw GEMM — the backward costs the same as
    the bf16 fast path's (the 2.02x-forward FLOP ratio is preserved)
    while the forward's GEMMs run on the 394-TOPS int8 MXU path.
    """
    return int8_matmul(x, w)


def _i8bwd_fwd(x, w):
    return int8_matmul(x, w), (x, w)


def _i8bwd_bwd(res, g):
    x, w = res
    # dx: (..., N) @ (K, N)^T -> (..., K)
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ()))
    ).astype(x.dtype)
    # dw: contract every batch dim of x (..., K) with g (..., N) -> (K, N).
    # Dead code (DCE'd) whenever w is frozen — kept for correctness when a
    # trainable dense is routed through this op.
    bdims = tuple(range(x.ndim - 1))
    dw = jax.lax.dot_general(
        x, g, ((bdims, bdims), ((), ()))
    ).astype(w.dtype)
    return dx, dw


int8_matmul_bf16_bwd.defvjp(_i8bwd_fwd, _i8bwd_bwd)


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` with the int8 inference matmul.

    Same param names/shapes ("kernel", "bias") — checkpoints, PEFT masks,
    and converters are oblivious to which class instantiated the layer.

    ``train_bwd=True`` selects :func:`int8_matmul_bf16_bwd` (differentiable
    int8 forward with full-precision backward) for ``TPU.INT8_FWD_TRAIN``.
    """

    features: int
    use_bias: bool = True
    train_bwd: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        mm = int8_matmul_bf16_bwd if self.train_bwd else int8_matmul
        y = mm(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y

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


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` with the int8 inference matmul.

    Same param names/shapes ("kernel", "bias") — checkpoints, PEFT masks,
    and converters are oblivious to which class instantiated the layer.
    """

    features: int
    use_bias: bool = True
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
        y = int8_matmul(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y

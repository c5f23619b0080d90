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


def _prequant_kernel(x_ref, w_ref, sw_ref, out_ref):
    """Fused activation-quantize + s8xs8 MXU matmul + rescale.

    One VMEM round-trip: the bf16 activation block is quantized in
    registers (per-row absmax over the FULL K, which the block carries),
    fed to the MXU as int8, and the int32 accumulator is rescaled and
    written back bf16 — no materialized x_i8 / scale / int32 tensors in
    HBM.  This is the loop-fusion overhead XLA cannot fuse away (the
    round/convert chain sat at ~3 TF/s as standalone fusions, BASELINE.md
    round 4).
    """
    x = x_ref[:].astype(jnp.float32)
    scale = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    x_i8 = jnp.round(x / scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_i8,
        w_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out_ref[:] = (
        acc.astype(jnp.float32) * scale * sw_ref[:]
    ).astype(out_ref.dtype)


def _prequant_matmul_pallas(
    x2d: jax.Array, w_i8: jax.Array, s_w: jax.Array, out_dtype
) -> jax.Array:
    from jax.experimental import pallas as pl

    m, k = x2d.shape
    n = w_i8.shape[1]
    bm = min(512, max(8, m))
    bn = min(512, n)
    m_pad = -(-m // bm) * bm
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _prequant_kernel,
        grid=(m_pad // bm, n // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
    )(x2d, w_i8, s_w)
    return out[:m] if m_pad != m else out


def _prequant_forward(x, w_i8, s_w, use_pallas=None):
    """Quantized forward shared by the jnp and Pallas paths.

    MEASURED NEGATIVE (BASELINE.md round 4): at the flagship's train
    shapes (M=3152) the one-kernel Pallas path loses to XLA's separate
    quantize + int8-GEMM fusions (1,514 vs 1,954 img/s on the full
    step) — the same small-shape grid/padding economics that sank the
    flash kernels at N=197.  Default is therefore the XLA path; the
    kernel stays available for large-M callers via ``use_pallas=True``.
    """
    if use_pallas is None:
        use_pallas = False
    if use_pallas:
        x2d = x.reshape(-1, x.shape[-1])
        out = _prequant_matmul_pallas(x2d, w_i8, s_w, x.dtype)
        return out.reshape(*x.shape[:-1], w_i8.shape[1])
    x_i8, s_x = quantize_rows(x)
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
def int8_prequant_matmul(
    x: jax.Array, w: jax.Array, w_i8: jax.Array, s_w: jax.Array
) -> jax.Array:
    """Like :func:`int8_matmul_bf16_bwd` but with the weight quantized
    AHEAD of time (``w_i8``, ``s_w`` from :func:`quantize_cols`).

    The per-call weight quantization in ``int8_matmul`` costs an O(K*N)
    read+round+write of the kernel per training step per layer — at the
    flagship's B=16 (M=3152) that is comparable to the int8 GEMM itself.
    A frozen tower's weights never change inside a dispatch, so the
    quantized tensors are computed ONCE per dispatch (outside the
    ``lax.scan`` over chained steps, engine helper
    :func:`quantize_frozen_tree`) and the step consumes them read-only.
    ``w`` (the original bf16/fp32 kernel) is only touched by the
    backward: dx = g @ w^T, exactly the dense cotangent.

    On TPU the forward runs as ONE Pallas kernel (quantize + MXU dot +
    rescale in VMEM, `_prequant_kernel`); elsewhere, as jnp ops.
    """
    return _prequant_forward(x, w_i8, s_w)


def _i8pq_fwd(x, w, w_i8, s_w):
    return int8_prequant_matmul(x, w, w_i8, s_w), (x, w)


def _i8pq_bwd(res, g):
    import numpy as np

    x, w = res
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ()))
    ).astype(x.dtype)
    bdims = tuple(range(x.ndim - 1))
    dw = jax.lax.dot_general(
        x, g, ((bdims, bdims), ((), ()))
    ).astype(w.dtype)
    # int8 primals take float0 cotangents; the scale is a dead end too
    d_w_i8 = np.zeros((w.shape[0], w.shape[1]), jax.dtypes.float0)
    return dx, dw, d_w_i8, jnp.zeros((1, w.shape[1]), jnp.float32)


int8_prequant_matmul.defvjp(_i8pq_fwd, _i8pq_bwd)


@jax.custom_vjp
def int8_prequant_matmul_i8bwd(
    x: jax.Array,
    w: jax.Array,
    w_i8: jax.Array,
    s_w: jax.Array,
    wt_i8: jax.Array,
    s_wt: jax.Array,
) -> jax.Array:
    """SwitchBack-style variant: int8 forward AND int8 dx backward.

    dx = g @ w^T contracts the incoming cotangent with the SAME frozen
    weights as the forward — ``wt_i8``/``s_wt`` are the pre-quantized
    TRANSPOSED kernel (per-dispatch, like ``w_i8``), and the backward
    quantizes g per-row dynamically.  dw (dead for frozen kernels) stays
    the dense product so a trainable kernel routed here still gets exact
    weight gradients.  Opt in via ``quantize_frozen_tree(bwd_dx=True)``;
    convergence-gated like the forward path.
    """
    return _prequant_forward(x, w_i8, s_w)


def _i8pq2_fwd(x, w, w_i8, s_w, wt_i8, s_wt):
    return _prequant_forward(x, w_i8, s_w), (x, w, wt_i8, s_wt)


def _i8pq2_bwd(res, g):
    import numpy as np

    x, w, wt_i8, s_wt = res
    dx = _prequant_forward(g, wt_i8, s_wt)
    bdims = tuple(range(x.ndim - 1))
    dw = jax.lax.dot_general(
        x, g, ((bdims, bdims), ((), ()))
    ).astype(w.dtype)
    k, n = w.shape
    return (
        dx,
        dw,
        np.zeros((k, n), jax.dtypes.float0),
        jnp.zeros((1, n), jnp.float32),
        np.zeros((n, k), jax.dtypes.float0),
        jnp.zeros((1, k), jnp.float32),
    )


int8_prequant_matmul_i8bwd.defvjp(_i8pq2_fwd, _i8pq2_bwd)


def quantize_static(x: jax.Array, s_x: jax.Array) -> jax.Array:
    """int8 quantize with a STATIC per-tensor scale: saturating, purely
    elementwise — no per-row reduce, so XLA fuses the whole chain
    (scale, round, clip, convert) into the activation's PRODUCER fusion
    (the LN/GELU epilogue emits int8 directly).  This is the round-5
    answer to the measured 13%-of-step dynamic-quantize chains
    (BASELINE.md round 4): the per-row absmax reduce was the part XLA
    could not fuse; a calibrated scalar removes it.

    Unlike the dynamic path, values can exceed the calibrated range —
    hence the clip (saturation, the standard static-quantization
    semantics)."""
    xf = x.astype(jnp.float32) / s_x
    return jnp.clip(jnp.round(xf), -127.0, 127.0).astype(jnp.int8)


def _static_forward(x, w_i8, s_w, s_x):
    x_i8 = quantize_static(x, s_x)
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
def int8_static_matmul(
    x: jax.Array,
    w: jax.Array,
    w_i8: jax.Array,
    s_w: jax.Array,
    s_x: jax.Array,
) -> jax.Array:
    """:func:`int8_prequant_matmul` with a STATIC per-tensor activation
    scale (``s_x``, a calibrated scalar — see
    :func:`activation_scales_from_stats`).  Backward is the dense dx/dw
    (QLoRA recipe), identical to the prequant op's."""
    return _static_forward(x, w_i8, s_w, s_x)


def _i8st_fwd(x, w, w_i8, s_w, s_x):
    return _static_forward(x, w_i8, s_w, s_x), (x, w)


def _i8st_bwd(res, g):
    import numpy as np

    x, w = res
    dx = jax.lax.dot_general(
        g, w, (((g.ndim - 1,), (1,)), ((), ()))
    ).astype(x.dtype)
    bdims = tuple(range(x.ndim - 1))
    dw = jax.lax.dot_general(
        x, g, ((bdims, bdims), ((), ()))
    ).astype(w.dtype)
    k, n = w.shape
    return (
        dx,
        dw,
        np.zeros((k, n), jax.dtypes.float0),
        jnp.zeros((1, n), jnp.float32),
        jnp.zeros((), jnp.float32),
    )


int8_static_matmul.defvjp(_i8st_fwd, _i8st_bwd)


@jax.custom_vjp
def int8_static_matmul_i8bwd(
    x: jax.Array,
    w: jax.Array,
    w_i8: jax.Array,
    s_w: jax.Array,
    wt_i8: jax.Array,
    s_wt: jax.Array,
    s_x: jax.Array,
) -> jax.Array:
    """Static-scale forward + int8 dx backward (SwitchBack).  The
    cotangent g keeps the DYNAMIC per-row quantize: its magnitude decays
    over training, so a calibrated static scale would saturate early
    steps or waste range late — only the forward's activation scale is
    static."""
    return _static_forward(x, w_i8, s_w, s_x)


def _i8st2_fwd(x, w, w_i8, s_w, wt_i8, s_wt, s_x):
    return _static_forward(x, w_i8, s_w, s_x), (x, w, wt_i8, s_wt)


def _i8st2_bwd(res, g):
    import numpy as np

    x, w, wt_i8, s_wt = res
    dx = _prequant_forward(g, wt_i8, s_wt)
    bdims = tuple(range(x.ndim - 1))
    dw = jax.lax.dot_general(
        x, g, ((bdims, bdims), ((), ()))
    ).astype(w.dtype)
    k, n = w.shape
    return (
        dx,
        dw,
        np.zeros((k, n), jax.dtypes.float0),
        jnp.zeros((1, n), jnp.float32),
        np.zeros((n, k), jax.dtypes.float0),
        jnp.zeros((1, k), jnp.float32),
        jnp.zeros((), jnp.float32),
    )


int8_static_matmul_i8bwd.defvjp(_i8st2_fwd, _i8st2_bwd)


def activation_scales_from_stats(stats, margin: float = 1.0) -> Any:
    """Turn a calibration pass's ``qstats`` collection (per-Int8Dense
    input absmax, sown by the module when the collection is mutable)
    into the ``qscale`` collection the static ops consume: every
    ``.../amax`` leaf becomes ``.../s_x = amax / 127``.

    Calibrate with one (or a few max-reduced) representative forward
    passes::

        _, st = model.apply(variables, x, True, mutable=["qstats"])
        qscale = activation_scales_from_stats(st["qstats"])
        model.apply({**variables, "qscale": qscale}, ...)
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(stats)
    out = {}
    for path, leaf in flat.items():
        if path[-1] == "amax":
            s_name = "s_x"
        elif path[-1].startswith("amax_"):
            # attention operands (TPU.INT8_ATTN): amax_q -> s_q etc.
            s_name = "s_" + path[-1][len("amax_"):]
        else:
            continue
        amax = jnp.max(jnp.asarray(leaf))  # sow tuples -> scalar
        # margin > 1 leaves saturation headroom for activation drift
        # between recalibrations (the PEFT deltas feed the residual
        # stream, so even a frozen tower's layer inputs move as the
        # adapters train)
        out[path[:-1] + (s_name,)] = jnp.maximum(
            amax.astype(jnp.float32) * float(margin) / 127.0, 1e-8
        )
    return traverse_util.unflatten_dict(out)


#: module names whose "kernel" is routed through Int8Dense by the models
#: (the frozen tower's GEMMs: packed qkv + out proj + the MLP pair)
INT8_TARGET_MODULES = ("in_proj", "out_proj", "c_fc", "c_proj")


def quantize_frozen_tree(
    frozen, targets=INT8_TARGET_MODULES, bwd_dx: bool = False
):
    """Pre-quantize a frozen param tree's Int8Dense kernels.

    Returns a flax variable collection (pass as ``{"qkernel": ...}`` to
    ``apply``) mirroring the module paths: every ``.../<target>/kernel``
    leaf becomes ``.../<target>/{w_i8, s_w}``.  None holes (trainable
    slots from ``split_params``) and non-target leaves are skipped, so
    the tree works for any PEFT mask.  Call once per dispatch, outside
    the chained-step scan.

    ``bwd_dx=True`` additionally emits the TRANSPOSED quantized kernel
    (``wt_i8``, ``s_wt``) — Int8Dense then runs the dx backward on the
    int8 MXU too (TPU.INT8_BWD_DX; SwitchBack recipe).
    """
    from flax import traverse_util

    flat = traverse_util.flatten_dict(frozen)
    out = {}
    for path, leaf in flat.items():
        if leaf is None:
            continue
        if len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets:
            w_i8, s_w = quantize_cols(leaf)
            out[path[:-1] + ("w_i8",)] = w_i8
            out[path[:-1] + ("s_w",)] = s_w
            if bwd_dx:
                wt_i8, s_wt = quantize_cols(leaf.T)
                out[path[:-1] + ("wt_i8",)] = wt_i8
                out[path[:-1] + ("s_wt",)] = s_wt
    return traverse_util.unflatten_dict(out)


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
        if self.train_bwd and self.is_mutable_collection("qstats"):
            # calibration pass (TPU.INT8_STATIC_ACT): record this
            # layer's input absmax; max-reduced across calls/batches
            self.sow(
                "qstats",
                "amax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        if self.train_bwd and self.has_variable("qkernel", "w_i8"):
            # pre-quantized weights supplied per dispatch
            # (quantize_frozen_tree) — skip the per-call weight quantize
            w_i8 = self.get_variable("qkernel", "w_i8")
            s_w = self.get_variable("qkernel", "s_w")
            s_x = (
                self.get_variable("qscale", "s_x")
                if self.has_variable("qscale", "s_x")
                else None
            )
            if self.has_variable("qkernel", "wt_i8"):
                # transposed tensors present -> int8 dx backward too
                wt_i8 = self.get_variable("qkernel", "wt_i8")
                s_wt = self.get_variable("qkernel", "s_wt")
                if s_x is not None:
                    y = int8_static_matmul_i8bwd(
                        x.astype(self.dtype),
                        kernel.astype(self.dtype),
                        w_i8, s_w, wt_i8, s_wt, s_x,
                    )
                else:
                    y = int8_prequant_matmul_i8bwd(
                        x.astype(self.dtype),
                        kernel.astype(self.dtype),
                        w_i8, s_w, wt_i8, s_wt,
                    )
            elif s_x is not None:
                y = int8_static_matmul(
                    x.astype(self.dtype),
                    kernel.astype(self.dtype),
                    w_i8, s_w, s_x,
                )
            else:
                y = int8_prequant_matmul(
                    x.astype(self.dtype),
                    kernel.astype(self.dtype),
                    w_i8,
                    s_w,
                )
        else:
            mm = int8_matmul_bf16_bwd if self.train_bwd else int8_matmul
            y = mm(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            y = y + bias.astype(y.dtype)
        return y

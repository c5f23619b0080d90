"""Multi-head attention for TPU.

The reference computes attention as ``softmax(q k^T / sqrt(d) + bias) v``
either via ``torch.nn.MultiheadAttention`` (CLIP path,
few_shot/vision_benchmark/evaluation/adapter_model.py:315) or inline
(supervised ViT path, evaluation/lora.py:165-201; RPB bias at RPB.py:131-144).

Here the hot path is a Pallas flash-attention kernel: block-tiled online
softmax, never materializing the (N, N) score matrix in HBM.  It supports

* an additive attention bias of shape (H, N, N), broadcast over batch —
  covers RPB (Swin-style relative position bias) and any causal/text mask;
* arbitrary sequence length via in-kernel padding masks (197-token ViT-B/16
  pads to 256; 577-token L/14-336 works unchanged).

A pure-jnp reference (`attention_reference`) serves CPU tests and is the
numerical ground truth for the kernel tests.  Both are wrapped in a
`jax.custom_vjp` dispatcher: forward = Pallas on TPU, backward = XLA VJP of
the reference formulation with the standard flash recomputation trick applied
by remat at the call site (the frozen-backbone training loop already remats
whole blocks — SURVEY §7 design spine #2).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# Reference implementation (ground truth; CPU fallback)
# ---------------------------------------------------------------------------


def attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    softmax_fp32: bool = True,
) -> jax.Array:
    """softmax(q k^T * scale + bias) v.

    q, k, v: (B, H, N, D).  bias: (H, Nq, Nk) or (B, H, Nq, Nk) or None.
    softmax_fp32=False keeps the score matrix in the compute dtype
    (TPU.BF16_SOFTMAX: halves score HBM traffic — measured +46% on the
    attention stack at B=64; scores at N=197 are pre-scaled and well
    within bf16 range, but fp32 stays the default).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    acc = jnp.float32 if softmax_fp32 else q.dtype
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=acc
    )
    s = s * jnp.asarray(scale, acc)
    if bias is not None:
        if bias.ndim == 3:
            bias = bias[None]
        s = s + bias.astype(acc)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhnm,bhmd->bhnd", p.astype(v.dtype), v
    ).astype(q.dtype)


def attention_bnhd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    softmax_fp32: bool = True,
) -> jax.Array:
    """Attention over (B, N, H, D) operands WITHOUT pre-splitting heads.

    The classic layout path reshape+transposes q/k/v from (B, N, H*D)
    to (B, H, N, D) before the score dot — three materialized layout
    copies per layer that the round-5 ViT-B/16 xprof put inside the
    14.5%-of-step "data formatting" class.  ``dot_general`` takes
    arbitrary batch dimensions, so the same contraction runs directly
    on the projection's natural (B, N, H, D) view (batch dims (0, 2)) —
    the head split becomes a free reshape and only the final
    head-merge transpose remains.

    MEASURED NEGATIVE (BASELINE.md round 5): on the full ViT-B/16 LoRA
    int8 train step this is an exact wash (2,147.7 vs 2,148.3 img/s) —
    the data-formatting copies are XLA's LAYOUT ASSIGNMENT for the
    batched attention dots, inserted whether or not the graph spells
    the transposes out, so eliminating the explicit transpose ops moves
    nothing.  Kept as a tested, documented negative so the lever is not
    re-chased; the model path keeps the classic (B, H, N, D) layout.

    Returns the merged (B, N, H*D).  Numerically identical to
    :func:`attention_reference` up to float reassociation.
    """
    b, n, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    acc = jnp.float32 if softmax_fp32 else q.dtype
    s = jax.lax.dot_general(
        q,
        k,
        (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=acc,
    )  # (B, H, N, M)
    p = jax.nn.softmax(s * jnp.asarray(scale, acc), axis=-1)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        (((3,), (1,)), ((0, 1), (0, 2))),
    )  # (B, H, N, D)
    return (
        o.transpose(0, 2, 1, 3).reshape(b, n, h * d).astype(q.dtype)
    )


# ---------------------------------------------------------------------------
# int8 attention scores (TPU.INT8_ATTN)
# ---------------------------------------------------------------------------


def _int8_attention_fwd_impl(q, k, v, s_q, s_k, s_v, scale, pv):
    from .int8 import quantize_static

    qi = quantize_static(q, s_q)
    ki = quantize_static(k, s_k)
    s = jax.lax.dot_general(
        qi,
        ki,
        (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # (B, H, N, M) exact int32
    sf = s.astype(jnp.float32) * (s_q * s_k * jnp.float32(scale))
    p = jax.nn.softmax(sf, axis=-1)
    if not pv:
        return jnp.einsum(
            "bhnm,bhmd->bhnd", p.astype(v.dtype), v
        ).astype(q.dtype)
    # PV also int8 (TPU.INT8_ATTN_PV — measured UNSTABLE in training,
    # see the class docstring): the softmax output lives in [0, 1], so
    # scale 1/127 is exact and needs no calibration
    vi = quantize_static(v, s_v)
    pi = jnp.round(p * 127.0).astype(jnp.int8)
    o = jax.lax.dot_general(
        pi,
        vi,
        (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    )  # (B, H, N, D)
    return (o.astype(jnp.float32) * (s_v / 127.0)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def int8_attention(q, k, v, s_q, s_k, s_v, scale, softmax_fp32=True,
                   pv=False):
    """Attention with the SCORE dot on the int8 MXU (TPU.INT8_ATTN).

    The round-5 xprof puts the N=197 attention-score chains at 45.7
    TF/s for 8.9% of the ViT-B/16 LoRA train step — the one GEMM class
    the int8 recipe hadn't reached, because scores contract activations
    with ACTIVATIONS, so no pre-quantizable weight exists.  The static
    per-tensor activation scales (TPU.INT8_STATIC_ACT machinery) close
    that gap: q and k get calibrated scales like every other layer
    input, and QK^T runs int8 with exact int32 accumulation.

    MEASURED NEGATIVE on chip (BASELINE.md round 5): on the full
    ViT-B/16 LoRA train step this runs at 1,933 img/s vs the bf16-
    attention baseline's 2,149 (-10%); +PV lands at 1,966 (-8.5%).
    The N=197 score dots were never MXU-rate-bound — they are SHAPE-
    bound (197 is 1.5 of a 128 tile), so halving the multiply width
    buys nothing, while the quantize/rescale chains around the dots
    and the int32 accumulator traffic ADD work and break XLA's fused
    bf16 attention pattern.  Kept as a tested, documented negative
    with the convergence analysis below; TPU.INT8_ATTN stays opt-in
    and off the headline configuration.

    ``pv=True`` (TPU.INT8_ATTN_PV) additionally quantizes the P @ V dot
    (softmax output at the statically-exact 1/127 scale, v at its
    calibrated scale).  MEASURED UNSTABLE in training: on the CI
    convergence gate the run learns to loss 0.03 and then DIVERGES —
    and the instability is attributable to the output noise itself,
    not the int8 dots (injecting only the round-trip noise
    ``round(p*127)/127`` or ``dequant(quant(v))`` into an otherwise
    bf16 attention reproduces the divergence, while QK-only int8 is
    stable at 100% accuracy through the same gate).  The attention
    OUTPUT feeds the residual stream directly, so its noise compounds
    across layers in a way the score-side noise (softmax renormalizes)
    does not.  Kept as an opt-in experiment.

    q, k, v: (B, H, N, D); s_q, s_k, s_v: calibrated f32 scalars
    (activation_scales_from_stats); scale: the 1/sqrt(d) score scale.

    Backward: the bf16-exact VJP of the reference attention on the
    saved full-precision q, k, v — the same QLoRA-style asymmetry as
    int8_matmul_bf16_bwd (quantization is a forward-only inference
    detail; gradients see clean math).  Convergence-gated with the
    other int8 paths in tests/test_int8_fwd_train.py.
    """
    return _int8_attention_fwd_impl(q, k, v, s_q, s_k, s_v, scale, pv)


def _int8_attn_vjp_fwd(q, k, v, s_q, s_k, s_v, scale, softmax_fp32, pv):
    out = _int8_attention_fwd_impl(q, k, v, s_q, s_k, s_v, scale, pv)
    return out, (q, k, v)


def _int8_attn_vjp_bwd(scale, softmax_fp32, pv, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(
            q_, k_, v_, None, scale, softmax_fp32
        ),
        q,
        k,
        v,
    )
    dq, dk, dv = vjp(g)
    z = jnp.zeros((), jnp.float32)
    return dq, dk, dv, z, z, z


int8_attention.defvjp(_int8_attn_vjp_fwd, _int8_attn_vjp_bwd)


# ---------------------------------------------------------------------------
# Pallas flash-attention forward kernel
# ---------------------------------------------------------------------------


def _flash_fwd_kernel(
    q_ref,  # (BQ, D)
    k_ref,  # (Npad, D)
    v_ref,  # (Npad, D)
    bias_ref,  # (BQ, Npad) or None
    o_ref,  # (BQ, D)
    lse_ref=None,  # (1, BQ) log-sum-exp rows (saved for the pallas backward)
    *,
    scale: float,
    seq_len: int,
    block_k: int,
    has_bias: bool,
):
    bq, d = q_ref.shape
    npad = k_ref.shape[0]
    num_kb = npad // block_k

    # keep q/k/v in their storage dtype (bf16): the MXU runs bf16 x bf16
    # -> fp32 at full rate, while fp32 x fp32 dots run ~4x slower — the
    # round-2 kernel upcast before the dots and lost exactly that factor
    q = q_ref[:]

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[pl.ds(kb * block_k, block_k), :]

        s = jax.lax.dot_general(
            q,
            k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BQ, BK) fp32
        if has_bias:
            s = s + bias_ref[:, pl.ds(kb * block_k, block_k)].astype(
                jnp.float32
            )
        # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        s = jnp.where(col + kb * block_k < seq_len, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype),  # bf16 for the MXU; acc stays fp32
            v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0, :] = (m + jnp.log(l))[:, 0]


def _flash_attention_fwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    scale: float,
    block_q: int,
    block_k: int,
    interpret: bool,
    return_lse: bool = False,
):
    b, h, n, d = q.shape
    npad = _round_up(n, max(block_q, block_k))
    block_q = min(block_q, npad)
    block_k = min(block_k, npad)
    # head_dim pads to the 128-lane tile (Mosaic rejects 64-lane slices
    # in this grid); the zero-lane qk/pv FLOPs are the cost of admission
    dpad = _round_up(d, 128)

    pad_n = npad - n
    pad_d = dpad - d
    if pad_n or pad_d:
        pad = ((0, 0), (0, 0), (0, pad_n), (0, pad_d))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, pad_n), (0, pad_n)))

    grid = (b, h, npad // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel,
        scale=scale,
        seq_len=n,
        block_k=block_k,
        has_bias=bias is not None,
    )

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, dpad),
            lambda ib, ih, iq: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, npad, dpad),
            lambda ib, ih, iq: (ib, ih, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, npad, dpad),
            lambda ib, ih, iq: (ib, ih, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, npad),
                lambda ib, ih, iq: (ih, iq, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias)

    def kernel_wrap(*refs):
        if bias is not None:
            if return_lse:
                q_ref, k_ref, v_ref, b_ref, o_ref, l_ref = refs
            else:
                q_ref, k_ref, v_ref, b_ref, o_ref = refs
                l_ref = None
        else:
            if return_lse:
                q_ref, k_ref, v_ref, o_ref, l_ref = refs
            else:
                q_ref, k_ref, v_ref, o_ref = refs
                l_ref = None
            b_ref = None
        kernel(
            q_ref.at[0, 0],
            k_ref.at[0, 0],
            v_ref.at[0, 0],
            b_ref if b_ref is None else b_ref.at[0],
            o_ref.at[0, 0],
            l_ref if l_ref is None else l_ref.at[0, 0],
        )

    out_shapes = [jax.ShapeDtypeStruct((b, h, npad, dpad), q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, dpad),
            lambda ib, ih, iq: (ib, ih, iq, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    if return_lse:
        # (b, h, 1, npad): mosaic requires the last two block dims be
        # (8-divisible, 128-divisible) or equal to the array dims
        out_shapes.append(
            jax.ShapeDtypeStruct((b, h, 1, npad), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 1, block_q),
                lambda ib, ih, iq: (ib, ih, 0, iq),
                memory_space=pltpu.VMEM,
            )
        )

    res = pl.pallas_call(
        kernel_wrap,
        out_shape=tuple(out_shapes) if return_lse else out_shapes[0],
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs) if return_lse else out_specs[0],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * npad * npad * dpad,
            bytes_accessed=(3 * b * h * npad * dpad + b * h * npad * dpad)
            * q.dtype.itemsize,
            transcendentals=b * h * npad * npad,
        ),
    )(*args)
    if return_lse:
        out, lse = res
        # trim lse to the logical n like out — the backward re-pads to
        # npad; returning it untrimmed would make that pad oversize
        return out[:, :, :n, :d], lse[:, :, :, :n]
    return res[:, :, :n, :d]


# ---------------------------------------------------------------------------
# Pallas flash-attention backward (bias-free path)
#
# Standard two-kernel formulation with the LSE saved from the forward:
#   P  = exp(scale*QK^T - L)
#   dV = P^T dO
#   dS = P o (dO V^T - D),  D = rowsum(dO o O)
#   dQ = scale * dS K,  dK = scale * dS^T Q
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale: float, seq_len: int, block_k: int,
):
    bq, d = q_ref.shape
    npad = k_ref.shape[0]
    num_kb = npad // block_k
    q = q_ref[:]  # storage dtype (bf16): full-rate MXU dots
    do = do_ref[:]
    lse = lse_ref[0, :][:, None]  # (BQ, 1)
    delta = delta_ref[0, :][:, None]

    def body(kb, acc):
        k_blk = k_ref[pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[pl.ds(kb * block_k, block_k), :]
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        s = jnp.where(col + kb * block_k < seq_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        return acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros((bq, d), jnp.float32)
    )
    dq_ref[:] = (scale * acc).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale: float, seq_len: int, block_q: int,
):
    bk, d = k_ref.shape
    npad = q_ref.shape[0]
    num_qb = npad // block_q
    k = k_ref[:]  # storage dtype (bf16): full-rate MXU dots
    v = v_ref[:]

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[pl.ds(qb * block_q, block_q), :]
        do_blk = do_ref[pl.ds(qb * block_q, block_q), :]
        lse_blk = lse_ref[0, pl.ds(qb * block_q, block_q)][:, None]
        delta_blk = delta_ref[0, pl.ds(qb * block_q, block_q)][:, None]
        s = scale * jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BQ, BK)
        p = jnp.exp(s - lse_blk)
        p_lo = p.astype(do_blk.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            p_lo, do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D)
        dp = jax.lax.dot_general(
            do_blk, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta_blk)).astype(q_blk.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, D)
        return dk_acc, dv_acc

    zeros = jnp.zeros((bk, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_qb, body, (zeros, zeros))
    dk_ref[:] = (scale * dk_acc).astype(dk_ref.dtype)
    dv_ref[:] = dv_acc.astype(dv_ref.dtype)


def _flash_attention_bwd(
    q, k, v, out, lse, g, scale, block_q, block_k, interpret
):
    """Pallas backward for the bias-free path; returns (dq, dk, dv)."""
    b, h, n, d = q.shape
    npad = _round_up(n, max(block_q, block_k))
    block_q = min(block_q, npad)
    block_k = min(block_k, npad)
    dpad = _round_up(d, 128)
    pad_n, pad_d = npad - n, dpad - d
    if pad_n or pad_d:
        pad = ((0, 0), (0, 0), (0, pad_n), (0, pad_d))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        out, g = jnp.pad(out, pad), jnp.pad(g, pad)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, 0), (0, pad_n)))

    # D = rowsum(dO o O): tiny elementwise pass, fused by XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, :, None, :]  # (b, h, 1, npad)

    qkv_spec = lambda bq: pl.BlockSpec(
        (1, 1, bq, dpad), lambda ib, ih, i: (ib, ih, i, 0),
        memory_space=pltpu.VMEM,
    )
    slab_spec = pl.BlockSpec(
        (1, 1, npad, dpad), lambda ib, ih, i: (ib, ih, 0, 0),
        memory_space=pltpu.VMEM,
    )
    row_spec = lambda bq: pl.BlockSpec(
        (1, 1, 1, bq), lambda ib, ih, i: (ib, ih, 0, i),
        memory_space=pltpu.VMEM,
    )
    row_slab = pl.BlockSpec(
        (1, 1, 1, npad), lambda ib, ih, i: (ib, ih, 0, 0),
        memory_space=pltpu.VMEM,
    )

    dq = pl.pallas_call(
        lambda q_r, k_r, v_r, do_r, l_r, d_r, dq_r: functools.partial(
            _flash_bwd_dq_kernel,
            scale=scale, seq_len=n, block_k=block_k,
        )(
            q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0], do_r.at[0, 0],
            l_r.at[0, 0], d_r.at[0, 0], dq_r.at[0, 0],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, npad, dpad), q.dtype),
        grid=(b, h, npad // block_q),
        in_specs=[
            qkv_spec(block_q), slab_spec, slab_spec, qkv_spec(block_q),
            row_spec(block_q), row_spec(block_q),
        ],
        out_specs=qkv_spec(block_q),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        lambda q_r, k_r, v_r, do_r, l_r, d_r, dk_r, dv_r: functools.partial(
            _flash_bwd_dkv_kernel,
            scale=scale, seq_len=n, block_q=block_q,
        )(
            q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0], do_r.at[0, 0],
            l_r.at[0, 0], d_r.at[0, 0], dk_r.at[0, 0], dv_r.at[0, 0],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, npad, dpad), q.dtype),
            jax.ShapeDtypeStruct((b, h, npad, dpad), q.dtype),
        ),
        grid=(b, h, npad // block_k),
        in_specs=[
            slab_spec, qkv_spec(block_k), qkv_spec(block_k),
            slab_spec, row_slab, row_slab,
        ],
        out_specs=(qkv_spec(block_k), qkv_spec(block_k)),
        interpret=interpret,
    )(q, k, v, g, lse, delta)

    return (
        dq[:, :, :n, :d],
        dk[:, :, :n, :d],
        dv[:, :, :n, :d],
    )


# ---------------------------------------------------------------------------
# Fused short-sequence attention (ViT regime: N <= ~1k)
#
# The flash kernel's grid is (B*H, N/bq) — at N=197 that is hundreds of
# ~0.1 us cells and per-cell overhead dominates (measured 4.2 TF/s vs
# XLA's 13 at B=16).  Here the grid is (B,) only: each cell holds ALL
# heads and the FULL (padded) sequence in VMEM and runs a plain softmax
# per head — no online rescaling, no score blocking.  Per-cell work is
# H * 2 * (2*Npad^2*D) ~ 200 MFLOP with ~1.6 MB of HBM traffic, which
# amortizes the cell overhead ~50x better than the flash grid.  The
# (Npad, Npad) scores live only in registers/VMEM scratch.
#
# Measured (v5e, N=197, bf16): fwd 10-12 TF/s vs XLA's 11.5-29 across
# B=16..64 — the cell overhead IS amortized now, but the per-head
# softmax (786k fp32 exp/max/sum VPU element-ops per cell) serializes
# against the MXU dots, while XLA's fusion autoscheduler overlaps the
# softmax of one (b, h) slice with the GEMMs of the next.  Kept as an
# opt-in (`use_fused=True`): it is the memory-lean option between the
# XLA path (scores in HBM at B>=64) and the flash kernel (slower still
# below N~2k), and the right starting point if a future Mosaic gains
# better VPU/MXU co-scheduling.
# ---------------------------------------------------------------------------


def _short_fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
    *, scale: float, seq_len: int, num_heads: int,
):
    npad = q_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
    keep = col < seq_len
    for h in range(num_heads):  # static unroll: H dots back-to-back
        q_h = q_ref[0, h]  # (Npad, D) storage dtype — bf16 MXU dots
        k_h = k_ref[0, h]
        v_h = v_ref[0, h]
        s = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (Npad, Npad) fp32
        if bias_ref is not None:
            s = s + bias_ref[h].astype(jnp.float32)
        s = jnp.where(keep, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            (p / l).astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = o.astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, h, 0, :] = (m + jnp.log(l))[:, 0]


def _short_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
    dq_ref, dk_ref, dv_ref,
    *, scale: float, seq_len: int, num_heads: int,
):
    npad = q_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
    keep = col < seq_len
    for h in range(num_heads):
        q_h = q_ref[0, h]
        k_h = k_ref[0, h]
        v_h = v_ref[0, h]
        do_h = do_ref[0, h]
        o_h = o_ref[0, h]
        lse = lse_ref[0, h, 0, :][:, None]  # (Npad, 1)
        s = jax.lax.dot_general(
            q_h, k_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(keep, s, NEG_INF)
        p = jnp.exp(s - lse)  # normalized probabilities
        p_lo = p.astype(do_h.dtype)
        dv_ref[0, h] = jax.lax.dot_general(
            p_lo, do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do_h, v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(
            do_h.astype(jnp.float32) * o_h.astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        ds = (scale * p * (dp - delta)).astype(k_h.dtype)
        dq_ref[0, h] = jax.lax.dot_general(
            ds, k_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, h] = jax.lax.dot_general(
            ds, q_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _short_pad(x, pad_n):
    return jnp.pad(x, ((0, 0), (0, 0), (0, pad_n), (0, 0)))


def _fused_short_fwd(
    q, k, v, bias, scale, interpret, return_lse=False
):
    b, h, n, d = q.shape
    npad = _round_up(n, 128)
    pad_n = npad - n
    if pad_n:
        q, k, v = _short_pad(q, pad_n), _short_pad(k, pad_n), _short_pad(v, pad_n)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, pad_n), (0, pad_n)))

    slab = pl.BlockSpec(
        (1, h, npad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [slab, slab, slab]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (h, npad, npad), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias)

    out_shapes = [jax.ShapeDtypeStruct((b, h, npad, d), q.dtype)]
    out_specs = [slab]
    if return_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((b, h, 1, npad), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec(
                (1, h, 1, npad), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    def kernel_wrap(*refs):
        if bias is not None:
            q_r, k_r, v_r, b_r, *outs = refs
        else:
            q_r, k_r, v_r, *outs = refs
            b_r = None
        o_r = outs[0]
        l_r = outs[1] if return_lse else None
        _short_fwd_kernel(
            q_r, k_r, v_r, b_r, o_r, l_r,
            scale=scale, seq_len=n, num_heads=h,
        )

    res = pl.pallas_call(
        kernel_wrap,
        out_shape=tuple(out_shapes) if return_lse else out_shapes[0],
        grid=(b,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if return_lse else out_specs[0],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * npad * npad * d,
            bytes_accessed=4 * b * h * npad * d * q.dtype.itemsize,
            transcendentals=b * h * npad * npad,
        ),
    )(*args)
    if return_lse:
        out, lse = res
        # trim to logical n (see _flash_fwd): the backward pads back to
        # npad and its row BlockSpec is exactly (1, h, 1, npad)
        return out[:, :, :n], lse[:, :, :, :n]
    return res[:, :, :n]


def _fused_short_bwd(q, k, v, out, lse, g, scale, interpret):
    b, h, n, d = q.shape
    npad = _round_up(n, 128)
    pad_n = npad - n
    if pad_n:
        q, k, v = _short_pad(q, pad_n), _short_pad(k, pad_n), _short_pad(v, pad_n)
        out, g = _short_pad(out, pad_n), _short_pad(g, pad_n)
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, 0), (0, pad_n)))

    slab = pl.BlockSpec(
        (1, h, npad, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec(
        (1, h, 1, npad), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        lambda q_r, k_r, v_r, o_r, do_r, l_r, dq_r, dk_r, dv_r: (
            _short_bwd_kernel(
                q_r, k_r, v_r, o_r, do_r, l_r, dq_r, dk_r, dv_r,
                scale=scale, seq_len=n, num_heads=h,
            )
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, npad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, npad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, npad, d), q.dtype),
        ),
        grid=(b,),
        in_specs=[slab, slab, slab, slab, slab, row],
        out_specs=(slab, slab, slab),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * npad * npad * d,
            bytes_accessed=8 * b * h * npad * d * q.dtype.itemsize,
            transcendentals=b * h * npad * npad,
        ),
    )(q, k, v, out, g, lse)
    return dq[:, :, :n], dk[:, :, :n], dv[:, :, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attention_fused_short(q, k, v, scale, interpret):
    return _fused_short_fwd(q, k, v, None, scale, interpret)


def _fused_short_vjp_fwd(q, k, v, scale, interpret):
    out, lse = _fused_short_fwd(
        q, k, v, None, scale, interpret, return_lse=True
    )
    return out, (q, k, v, out, lse)


def _fused_short_vjp_bwd(scale, interpret, res, g):
    q, k, v, out, lse = res
    return _fused_short_bwd(q, k, v, out, lse, g, scale, interpret)


_attention_fused_short.defvjp(_fused_short_vjp_fwd, _fused_short_vjp_bwd)


# ---------------------------------------------------------------------------
# Public dispatcher with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attention(q, k, v, scale, use_flash, interpret, softmax_fp32=True):
    return _attention_fwd_impl(
        q, k, v, None, scale, use_flash, interpret, softmax_fp32
    )


def _attention_fwd_impl(
    q, k, v, bias, scale, use_flash, interpret, softmax_fp32=True
):
    if use_flash:
        return _flash_attention_fwd(
            q, k, v, bias, scale, block_q=128, block_k=128,
            interpret=interpret,
        )
    return attention_reference(q, k, v, bias, scale, softmax_fp32)


def _attention_vjp_fwd(q, k, v, scale, use_flash, interpret, softmax_fp32):
    if use_flash:
        out, lse = _flash_attention_fwd(
            q, k, v, None, scale, block_q=128, block_k=128,
            interpret=interpret, return_lse=True,
        )
        return out, (q, k, v, out, lse)
    out = _attention(q, k, v, scale, use_flash, interpret, softmax_fp32)
    return out, (q, k, v, None, None)


def _attention_vjp_bwd(scale, use_flash, interpret, softmax_fp32, res, g):
    q, k, v, out, lse = res
    if use_flash and out is not None:
        return _flash_attention_bwd(
            q, k, v, out, lse, g, scale, 128, 128, interpret
        )
    # Backward recomputes the forward via the reference formulation; the
    # (N, N) intermediate lives only inside this fused XLA computation.
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(
            q_, k_, v_, None, scale, softmax_fp32
        ),
        q,
        k,
        v,
    )
    return vjp(g)


_attention.defvjp(_attention_vjp_fwd, _attention_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _attention_bias(
    q, k, v, bias, scale, use_flash, interpret, softmax_fp32=True
):
    return _attention_fwd_impl(
        q, k, v, bias, scale, use_flash, interpret, softmax_fp32
    )


def _attention_bias_vjp_fwd(
    q, k, v, bias, scale, use_flash, interpret, softmax_fp32
):
    out = _attention_bias(
        q, k, v, bias, scale, use_flash, interpret, softmax_fp32
    )
    return out, (q, k, v, bias)


def _attention_bias_vjp_bwd(
    scale, use_flash, interpret, softmax_fp32, res, g
):
    q, k, v, bias = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: attention_reference(
            q_, k_, v_, b_, scale, softmax_fp32
        ),
        q,
        k,
        v,
        bias,
    )
    return vjp(g)


_attention_bias.defvjp(_attention_bias_vjp_fwd, _attention_bias_vjp_bwd)


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
    interpret: bool = False,
    softmax_fp32: bool = True,
    batch_chunk: int = 0,
    use_fused: Optional[bool] = None,
) -> jax.Array:
    """Dispatching attention: Pallas flash kernel on TPU, jnp elsewhere.

    q, k, v: (B, H, N, D); bias: (H, N, N) additive, or None.
    softmax_fp32=False keeps scores in the compute dtype on the XLA path
    (TPU.BF16_SOFTMAX; the flash kernel always accumulates in fp32).

    batch_chunk > 0 (TPU.ATTN_BATCH_CHUNK): compute the XLA attention in
    ``lax.map`` slices of that batch size.  At B >= ~32 the fused
    (B, H, N, N) score tensor spills VMEM and the attention chain scales
    superlinearly (BASELINE.md round 2: 4x batch -> 13-18x attention
    time); chunking keeps each slice's scores VMEM-resident so attention
    scales linearly while every OTHER GEMM in the step sees the large-M
    efficiency win (measured v5e MLP chain: 152 TF/s at M=3152 vs 183 at
    M=12608).  The custom-VJP backward recomputes per slice, so the
    backward chunks too.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if use_fused is None:
        use_fused = False  # opt-in until the v5e win is confirmed
    if (
        use_fused
        and bias is None
        and q.shape[-2] <= 1024
        and (interpret or jax.default_backend() == "tpu")
    ):
        return _attention_fused_short(q, k, v, float(scale), interpret)
    if use_flash is None:
        # Measured on v5e: XLA's fused attention beats the Pallas kernel
        # at ViT sequence lengths (197: 1.7x; 577: 1.5x) — the S x S
        # intermediate is cheap there and XLA schedules the small matmuls
        # better.  The kernel's win is MEMORY: at N >= ~2k the
        # B*H*N^2 scores (e.g. 8k tokens, 12 heads, b32 -> 98 GB fp32)
        # stop fitting, while the flash kernel stays O(N*D).
        use_flash = (
            jax.default_backend() == "tpu" and q.shape[-2] >= 2048
        )
    b = q.shape[0]
    if (
        batch_chunk
        and not use_flash
        and bias is None
        and b > batch_chunk
        and b % batch_chunk == 0
    ):
        def slice_attn(args):
            qc, kc, vc = args
            return _attention(
                qc, kc, vc, float(scale), False, interpret,
                bool(softmax_fp32),
            )

        shaped = lambda t: t.reshape(
            b // batch_chunk, batch_chunk, *t.shape[1:]
        )
        out = jax.lax.map(slice_attn, (shaped(q), shaped(k), shaped(v)))
        return out.reshape(b, *out.shape[2:])
    if bias is None:
        return _attention(
            q, k, v, float(scale), bool(use_flash), interpret,
            bool(softmax_fp32),
        )
    return _attention_bias(
        q, k, v, bias, float(scale), bool(use_flash), interpret,
        bool(softmax_fp32),
    )

"""Parameterized hypercomplex multiplication (PHM / Kronecker) ops.

The math of the reference's Compacter and KAdaptation methods:

* ``kronecker_product_einsum_batched`` / ``matvec_product`` —
  reference few_shot/vision_benchmark/evaluation/compacter_model.py:176-207
  and kadaptation.py:81-115:  ``H = sum_i  rule_i (x) W_i`` where ``rule`` is
  (n, n, n) and ``W`` is (n, in/n, out/n); then ``y = x @ H (+ b)``.
* KAdaptation factorizes ``W_i = W_left_i @ W_right_i`` with rank
  ``phm_rank`` (kadaptation.py:163-188, ``W1 = bmm(W_left1, W_right1)``).

All functions are pure and jit/vmap-friendly.  The Kronecker expansion is a
single einsum (MXU-friendly); for the adapter-sized operands here
(768x64 H matrices) XLA fuses it with the consuming matmul.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def kronecker_product_batched(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched Kronecker product: a (n, p, q), b (n, r, s) -> (n, p*r, q*s)."""
    n, p, q = a.shape
    _, r, s = b.shape
    out = jnp.einsum("npq,nrs->nprqs", a, b)
    return out.reshape(n, p * r, q * s)


def phm_weight(rule: jax.Array, w: jax.Array) -> jax.Array:
    """Build ``H = sum_i rule_i (x) W_i``.

    rule: (n, n, n); w: (n, in/n, out/n) -> H: (in, out).
    """
    return kronecker_product_batched(rule, w).sum(0)


def phm_linear(
    x: jax.Array,
    rule: jax.Array,
    w: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """y = x @ H (+ bias) with H the PHM-constructed weight."""
    h = phm_weight(rule, w)
    y = jnp.einsum(
        "...i,io->...o", x, h, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def factorized_phm_weight(
    rule: jax.Array, w_left: jax.Array, w_right: jax.Array
) -> jax.Array:
    """KAdaptation: H = sum_i rule_i (x) (W_left_i @ W_right_i).

    rule: (n, n, n); w_left: (n, in/n, r); w_right: (n, r, out/n).
    """
    w = jnp.einsum("nir,nro->nio", w_left, w_right)
    return phm_weight(rule, w)

"""Fast Walsh-Hadamard transform (WHT) for the Fastfood intrinsic-dimension
reparameterization.

Reference math: full_shot/main/intrinsic/fastfood.py:81-121
(``fast_walsh_hadamard_torched``): log2(d) butterfly stages of
``[a+b; a-b]`` over a power-of-two vector, optionally normalized by
``d**-0.5`` per stage pair (the reference normalizes by ``2**-0.5`` each
stage via ``normalize=True`` -> overall orthonormal H).

Two implementations:

* ``wht_matmul`` — for the sizes Fastfood meets here (wrapped ViT modules,
  d <= 2^23 split into <= 2^13-sized factors after Fastfood blocking), a
  dense H matmul on the MXU often beats a butterfly on TPU for d <= 8192.
  Used when d <= 4096.
* ``wht`` — O(d log d) butterfly as a lax.fori_loop of reshaped adds —
  compiles to VPU shuffles, no Pallas needed (the access pattern is regular
  and XLA tiles it well); used for large d.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@functools.lru_cache(maxsize=16)
def _hadamard_matrix(d: int) -> jax.Array:
    """Dense orthonormal Hadamard matrix H_d (d a power of two)."""
    h = jnp.array([[1.0]], jnp.float32)
    while h.shape[0] < d:
        h = jnp.block([[h, h], [h, -h]])
    return h / jnp.sqrt(jnp.float32(d))


def wht_matmul(x: jax.Array, normalize: bool = True) -> jax.Array:
    d = x.shape[-1]
    h = _hadamard_matrix(d)
    if not normalize:
        h = h * jnp.sqrt(jnp.float32(d))
    return jnp.einsum("...i,ij->...j", x.astype(jnp.float32), h)


def wht_butterfly(x: jax.Array, normalize: bool = True) -> jax.Array:
    """Butterfly WHT over the last axis (power-of-two length)."""
    d = x.shape[-1]
    assert _is_pow2(d), f"WHT length must be a power of two, got {d}"
    stages = d.bit_length() - 1
    lead = x.shape[:-1]
    y = x.astype(jnp.float32)

    def stage(i, y):
        half = d >> (i + 1)
        # shape (..., blocks, 2, half): pairs at stride `half`
        z = y.reshape(*lead, -1, 2, half)
        a = z[..., 0, :]
        b = z[..., 1, :]
        z = jnp.stack([a + b, a - b], axis=-2)
        return z.reshape(*lead, d)

    # static python unroll: `stages` is tiny (<= 23) and the reshape shapes
    # differ per stage, so lax.fori_loop cannot carry them.
    for i in range(stages):
        y = stage(i, y)
    if normalize:
        y = y / jnp.sqrt(jnp.float32(d))
    return y


def wht(x: jax.Array, normalize: bool = True) -> jax.Array:
    d = x.shape[-1]
    assert _is_pow2(d), f"WHT length must be a power of two, got {d}"
    if d <= 4096:
        return wht_matmul(x, normalize)
    return wht_butterfly(x, normalize)

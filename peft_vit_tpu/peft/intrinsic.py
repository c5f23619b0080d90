"""Intrinsic-dimension training: Fastfood / dense subspace reparameterization.

Reference: full_shot/main/intrinsic/fastfood.py (FastfoodWrap) and dense.py
(DenseWrap), driven by tools/intrinsic_dimension.py with
``--layerType {attention,mlp,adapter} --layernum N`` selecting ONE block's
submodule to wrap (lib/models/cls_intrinsic_dimension.py:782-783).

Math reproduced exactly (fastfood_torched, fastfood.py:151-187):

    theta = theta0 + Fastfood(V)[:DD] ,
    Fastfood(V) = H G Pi H (B V_pad) / (divisor * sqrt(DD/LL)) ,
    divisor = sqrt(LL * sum(G^2)),  LL = 2^ceil(log2 DD),
    H = UNnormalized Walsh-Hadamard, B in {+-1}, Pi a permutation,
    G ~ N(0,1) — all fixed; V in R^d is the only trainable vector
    (zeros init), shared across every wrapped tensor.

The reference re-materializes weights each forward via ``setattr`` — a
mutation JAX can't trace.  Here materialization is a pure function
``materialize(proj, v, said)`` composed into the apply fn, so it jits,
vmaps over sweep cells, and differentiates (d(loss)/dV flows through the
transform).

SAID (Structure-Aware Intrinsic Dimension, Aghajanyan et al. 2021) adds a
per-tensor trainable scale: theta_i = theta0_i + lambda_i * P_i(V).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from ..ops.wht import wht_butterfly, wht_matmul
from .masks import merge_params


def _next_pow2(n: int) -> int:
    return 1 << max(int(np.ceil(np.log2(max(n, 1)))), 0)


def _wht_unnorm(x: jax.Array) -> jax.Array:
    d = x.shape[-1]
    if d <= 4096:
        return wht_matmul(x, normalize=False)
    return wht_butterfly(x, normalize=False)


class LeafProjection(NamedTuple):
    b: jax.Array  # (LL,) +-1
    pi: jax.Array  # (LL,) permutation indices
    g: jax.Array  # (LL,) gaussian
    divisor: jax.Array  # scalar
    dd: int
    ll: int
    shape: Tuple[int, ...]


class IntrinsicProjection(NamedTuple):
    kind: str  # 'fastfood' | 'dense'
    dim: int
    theta0: Dict[str, jax.Array]  # flat path -> initial value
    leaves: Dict[str, Any]  # flat path -> LeafProjection | dense matrix


def build_projection(
    rng: jax.Array,
    target_params: Dict[str, Any],
    intrinsic_dim: int,
    kind: str = "fastfood",
) -> IntrinsicProjection:
    """target_params: pytree of the tensors being reparameterized."""
    flat = traverse_util.flatten_dict(target_params, sep="/")
    theta0 = {k: jnp.asarray(v) for k, v in flat.items()}
    leaves: Dict[str, Any] = {}
    for i, (k, v) in enumerate(sorted(theta0.items())):
        key = jax.random.fold_in(rng, i)
        dd = int(np.prod(v.shape))
        if kind == "fastfood":
            ll = max(_next_pow2(dd), _next_pow2(intrinsic_dim))
            kb, kp, kg = jax.random.split(key, 3)
            b = (
                jax.random.randint(kb, (ll,), 0, 2).astype(jnp.float32)
                * 2.0
                - 1.0
            )
            pi = jax.random.permutation(kp, ll)
            g = jax.random.normal(kg, (ll,))
            divisor = jnp.sqrt(ll * jnp.sum(g**2))
            leaves[k] = LeafProjection(
                b, pi, g, divisor, dd, ll, tuple(v.shape)
            )
        elif kind == "dense":
            # DenseWrap: P ~ N(0,1)/sqrt(d), shape (DD, d)
            p = jax.random.normal(
                key, (dd, intrinsic_dim)
            ) / jnp.sqrt(jnp.float32(intrinsic_dim))
            leaves[k] = p
        else:
            raise ValueError(f"unknown projection kind {kind!r}")
    return IntrinsicProjection(kind, intrinsic_dim, theta0, leaves)


def fastfood_transform(v: jax.Array, leaf: LeafProjection) -> jax.Array:
    """H G Pi H (B v_pad) / (divisor * sqrt(DD/LL)), reference
    fastfood_torched semantics."""
    vpad = jnp.zeros((leaf.ll,), v.dtype).at[: v.shape[0]].set(v)
    m1 = leaf.b * vpad
    m2 = _wht_unnorm(m1)
    m3 = m2[leaf.pi]
    m4 = m3 * leaf.g
    m5 = _wht_unnorm(m4)
    scale = leaf.divisor * jnp.sqrt(jnp.float32(leaf.dd) / leaf.ll)
    return (m5[: leaf.dd] / scale).reshape(leaf.shape)


def materialize(
    proj: IntrinsicProjection,
    v: jax.Array,
    said: Optional[Dict[str, jax.Array]] = None,
) -> Dict[str, Any]:
    """theta = theta0 + (lambda_i *) P_i(v), as a flat {path: array}."""
    out = {}
    for k, theta0 in proj.theta0.items():
        if proj.kind == "fastfood":
            ray = fastfood_transform(v, proj.leaves[k])
        else:
            p = proj.leaves[k]
            ray = (p @ v).reshape(theta0.shape)
        if said is not None:
            ray = ray * said[k]
        out[k] = theta0 + ray.astype(theta0.dtype)
    return out


def select_intrinsic_targets(
    params: Dict[str, Any],
    layer_type: str = "all",
    layer_num: int = -1,
) -> Dict[str, bool]:
    """--layerType/--layernum selection as a flat path mask
    (cls_intrinsic_dimension.py:782-783: wrap one block's attention / mlp /
    adapter; 'all' = the whole backbone)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    pat = {
        "attention": r"/attn/",
        "mlp": r"/mlp/",
        "adapter": r"/adapter/",
        "all": r"",
    }[layer_type]
    mask = {}
    for k in flat:
        ok = bool(re.search(pat, k)) if pat else True
        if layer_num >= 0:
            ok = ok and f"blocks_{layer_num}/" in k
        mask[k] = ok and not k.startswith("classifier/")
    return mask


def make_intrinsic_apply(
    model_apply: Callable,
    proj: IntrinsicProjection,
    base_params: Dict[str, Any],
    use_said: bool = False,
):
    """Returns (apply_fn, trainable, frozen) pluggable into the engine.

    trainable = {'v': zeros(d)} (+ {'said': ones per leaf}); the apply fn
    materializes theta and grafts it onto base_params before the forward.
    """
    flat_base = traverse_util.flatten_dict(base_params, sep="/")

    def apply_fn(variables, x, train):
        p = variables["params"]
        v = p["v"]
        said = p.get("said") if use_said else None
        theta = materialize(proj, v, said)
        merged = dict(flat_base)
        merged.update(theta)
        full = traverse_util.unflatten_dict(merged, sep="/")
        return model_apply({"params": full}, x, train)

    trainable: Dict[str, Any] = {"v": jnp.zeros((proj.dim,), jnp.float32)}
    frozen: Dict[str, Any] = {"v": None}
    if use_said:
        trainable["said"] = {
            k: jnp.ones((), jnp.float32) for k in proj.theta0
        }
        frozen["said"] = {k: None for k in proj.theta0}
    return apply_fn, trainable, frozen

"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (its only distribution is DDP,
SURVEY §2.4); this is the TPU-native pipeline the ViT block stack gets
for free from its scan-over-layers layout: the stacked block params
(L, ...) are reshaped to (S, L/S, ...) and sharded over a ``pipe`` mesh
axis, and a ``shard_map`` SPMD program runs the classic GPipe schedule —
every device executes its layer chunk each tick, activations rotate to
the next stage over ICI via ``lax.ppermute``, and microbatches stream in
at stage 0.  For M microbatches and S stages the schedule takes M+S-1
ticks (bubble fraction (S-1)/(M+S-1)).

Because every collective is differentiable (the transpose of the
forward ring is the reverse ring), ``jax.grad`` through
``pipeline_apply`` IS pipelined backprop — no hand-written backward
schedule.  Composes with a ``data`` axis in the same mesh: the batch
dim stays sharded over ``data`` while layers shard over ``pipe``.

Mental model: jax-ml.github.io/scaling-book (pipelining chapter) —
shard layers, rotate activations with collectives, let XLA overlap the
ppermute with the next tick's compute.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

PIPE_AXIS = "pipe"


def stage_params(stacked: Any, n_stages: int) -> Any:
    """(L, ...) block stacks -> (S, L/S, ...) for sharding over pipe."""

    def split(x):
        l = x.shape[0]
        assert l % n_stages == 0, (l, n_stages)
        return x.reshape(n_stages, l // n_stages, *x.shape[1:])

    return jax.tree_util.tree_map(split, stacked)


def unstage_params(staged: Any) -> Any:
    """(S, L/S, ...) -> (L, ...)."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), staged
    )


def pipeline_apply(
    block_fn: Callable[[Any, jax.Array], jax.Array],
    staged: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = PIPE_AXIS,
    batch_axis: str | None = None,
) -> jax.Array:
    """Run x through all S * (L/S) layers, pipelined over ``axis``.

    ``block_fn(layer_params, h) -> h`` applies ONE layer (pure function
    of one (no-leading-dim) param subtree).  ``staged`` is
    ``stage_params(stacked, S)`` sharded P(axis, ...).  ``x`` is
    (B, ...) with B divisible by ``microbatches`` (per data shard).

    Returns (B, ...) activations after the full stack, replicated over
    ``axis`` (sharded over ``batch_axis`` if given).
    """
    n_stages = mesh.shape[axis]
    m = microbatches

    def chunk_fn(chunk, h):
        # local (1, L/S, ...) -> scan the layer subtree stack
        def body(c, p):
            return block_fn(p, c), None

        sub = jax.tree_util.tree_map(lambda t: t[0], chunk)
        return jax.lax.scan(body, h, sub)[0]

    def spmd(chunk, xmb):
        s = jax.lax.axis_index(axis)
        mb_shape = xmb.shape[1:]

        def tick(carry, t):
            h_in, outbuf = carry
            # stage 0 ingests microbatch t (clipped; garbage ticks are
            # never collected), later stages take the rotated activation
            fresh = jax.lax.dynamic_index_in_dim(
                xmb, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )
            h = jnp.where(s == 0, fresh, h_in)
            h_out = chunk_fn(chunk, h)
            # the last stage finishes microbatch t-(S-1) at tick t
            out_t = t - (n_stages - 1)
            idx = jnp.clip(out_t, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(
                outbuf, idx, 0, keepdims=False
            )
            take = (out_t >= 0) & (s == n_stages - 1)
            outbuf = jax.lax.dynamic_update_index_in_dim(
                outbuf, jnp.where(take, h_out, cur), idx, 0
            )
            # rotate s -> s+1 (ring; the wraparound into stage 0 is
            # overwritten by the fresh microbatch)
            h_next = jax.lax.ppermute(
                h_out,
                axis,
                [(i, (i + 1) % n_stages) for i in range(n_stages)],
            )
            return (h_next, outbuf), None

        outbuf0 = jnp.zeros((m,) + mb_shape, xmb.dtype)
        (_, outbuf), _ = jax.lax.scan(
            tick,
            (jnp.zeros(mb_shape, xmb.dtype), outbuf0),
            jnp.arange(m + n_stages - 1),
        )
        # broadcast the last stage's buffer to every pipe rank (zeros
        # elsewhere, so the psum is a select-and-broadcast)
        return jax.lax.psum(
            jnp.where(s == n_stages - 1, outbuf, jnp.zeros_like(outbuf)),
            axis,
        )

    b = x.shape[0]
    assert b % m == 0, (b, m)
    xmb = x.reshape(m, b // m, *x.shape[1:])

    data_spec = (batch_axis,) if batch_axis else (None,)
    param_spec = jax.tree_util.tree_map(lambda _: P(axis), staged)
    fn = shard_map(
        spmd,
        mesh=mesh,
        in_specs=(param_spec, P(None, *data_spec)),
        out_specs=P(None, *data_spec),
        check_vma=False,
    )
    out = fn(staged, xmb)
    return out.reshape(b, *out.shape[2:])


def vit_pipeline_forward(
    model,
    variables: dict,
    x: jax.Array,
    *,
    mesh: Mesh,
    microbatches: int,
    axis: str = PIPE_AXIS,
    batch_axis: str | None = None,
    deterministic: bool = True,
) -> jax.Array:
    """Forward an ImageClassifier whose VisionTransformer backbone was
    built with ``scan_layers=True``, pipelining the block stack.

    embed (conv1/pos/ln_pre) and head (ln_post/proj/classifier) run
    replicated through the module itself (``stop_layer=0`` /
    ``start_layer=L``); the stacked ``backbone/blocks`` params are
    staged over ``axis`` and applied by ``pipeline_apply``.  With LoRA &
    co. in the spec, the PEFT deltas ride the same pipeline (they live
    in the block params), so ``jax.grad`` of a loss over the returned
    logits trains pipelined.
    """
    from ..models.layers import Block

    bk = model.backbone
    assert getattr(bk, "scan_layers", False), (
        "vit_pipeline_forward needs a scan_layers=True backbone "
        "(stacked blocks)"
    )
    n_stages = mesh.shape[axis]
    staged = stage_params(
        variables["params"]["backbone"]["blocks"], n_stages
    )
    n_prefix = 1 + (bk.spec.prompt_tokens or 0)
    block = Block(
        bk.width,
        bk.heads,
        mlp_ratio=bk.mlp_ratio,
        act="quick_gelu" if bk.style == "clip" else "gelu",
        spec=bk.spec,
        layer_idx=0,
        grid_size=bk.grid_size,
        n_prefix=n_prefix,
        use_flash=bk.use_flash,
        softmax_fp32=bk.softmax_fp32,
        int8=bk.int8,
        attn_batch_chunk=bk.attn_batch_chunk,
        drop_path=0.0,
        ln_fp32=bk.ln_fp32,
        dtype=bk.dtype,
        param_dtype=bk.param_dtype,
    )

    def block_fn(p, h):
        return block.apply({"params": p["block"]}, h, deterministic)

    tokens = model.apply(
        variables,
        x,
        not deterministic,
        method=lambda m, xx, tr: m.backbone(xx, not tr, True, 0, 0),
    )
    tokens = pipeline_apply(
        block_fn,
        staged,
        tokens,
        mesh=mesh,
        microbatches=microbatches,
        axis=axis,
        batch_axis=batch_axis,
    )
    return model.apply(
        variables, tokens, not deterministic, bk.layers
    )

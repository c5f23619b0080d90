"""MoBY self-supervised training (the objective the SSL-Swin backbone is
built for).

The reference ships only the backbone (lib/models/ssl_swin.py
``get_cls_model(config, is_teacher=...)`` — student/teacher variants);
the MoBY objective (Xie et al. 2021, "Self-Supervised Learning with Swin
Transformers") is re-expressed here functionally, TPU-first:

* online encoder (backbone -> projector -> predictor) and target encoder
  (backbone -> projector) as two param pytrees
* momentum update of the target inside the jitted step
* key queues as fixed-size device buffers updated with
  ``lax.dynamic_update_slice`` (no host round-trip)
* symmetric contrastive loss: each view's prediction against the other
  view's target keys + its queue (temperature tau)
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class MobyProjector(nn.Module):
    """2-layer MLP head (projector / predictor)."""

    hidden: int = 4096
    out: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(self.out, name="fc2", dtype=self.dtype)(x)


class MobyEncoder(nn.Module):
    """backbone -> projector (-> predictor when ``with_predictor``)."""

    backbone: nn.Module
    proj_hidden: int = 4096
    embed_dim: int = 256
    with_predictor: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        feats = self.backbone(x, deterministic)
        z = MobyProjector(
            self.proj_hidden, self.embed_dim, name="proj", dtype=self.dtype
        )(feats)
        if self.with_predictor:
            z = MobyProjector(
                self.proj_hidden,
                self.embed_dim,
                name="pred",
                dtype=self.dtype,
            )(z)
        return z


class MobyState(NamedTuple):
    online: Any  # online encoder params (backbone+proj+pred)
    target: Any  # target encoder params (backbone+proj); EMA of online
    opt_state: Any
    queue1: jax.Array  # (K, D) keys of view-1 targets
    queue2: jax.Array
    ptr: jax.Array
    step: jax.Array


def _l2(x):
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def contrastive_with_queue(q, k, queue, tau: float) -> jax.Array:
    """InfoNCE: positive = matching key, negatives = the queue."""
    l_pos = jnp.sum(q * k, axis=-1, keepdims=True) / tau
    l_neg = q @ queue.T / tau
    logits = jnp.concatenate([l_pos, l_neg], axis=1)
    return -jnp.mean(jax.nn.log_softmax(logits, axis=-1)[:, 0])


def init_moby_state(
    online_model: MobyEncoder,
    target_model: MobyEncoder,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample: jax.Array,
    queue_len: int = 4096,
) -> MobyState:
    online = online_model.init(rng, sample)["params"]
    t_full = target_model.init(rng, sample)["params"]
    # target starts as a copy of the online backbone+proj (pred excluded)
    target = jax.tree_util.tree_map(
        jnp.copy, {k: online[k] for k in t_full}
    )
    dim = int(online_model.embed_dim)
    return MobyState(
        online=online,
        target=target,
        opt_state=tx.init(online),
        # two distinct buffers: the donated step must never see aliases
        queue1=jnp.zeros((queue_len, dim), jnp.float32),
        queue2=jnp.zeros((queue_len, dim), jnp.float32),
        ptr=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )


def make_moby_train_step(
    online_model: MobyEncoder,
    target_model: MobyEncoder,
    tx: optax.GradientTransformation,
    tau: float = 0.2,
    base_momentum: float = 0.99,
    total_steps: int = 10_000,
):
    """One jitted MoBY step over two augmented views (x1, x2)."""

    def momentum_at(step):
        # cosine ramp base_momentum -> 1.0 (MoBY schedule)
        t = jnp.clip(step / max(total_steps, 1), 0.0, 1.0)
        return 1.0 - (1.0 - base_momentum) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t)
        )

    def step_fn(state: MobyState, x1, x2):
        k1 = _l2(
            target_model.apply({"params": state.target}, x1, True)
        ).astype(jnp.float32)
        k2 = _l2(
            target_model.apply({"params": state.target}, x2, True)
        ).astype(jnp.float32)
        k1 = jax.lax.stop_gradient(k1)
        k2 = jax.lax.stop_gradient(k2)

        def loss_fn(online):
            q1 = _l2(
                online_model.apply({"params": online}, x1, False)
            ).astype(jnp.float32)
            q2 = _l2(
                online_model.apply({"params": online}, x2, False)
            ).astype(jnp.float32)
            return contrastive_with_queue(
                q1, k2, state.queue2, tau
            ) + contrastive_with_queue(q2, k1, state.queue1, tau)

        loss, grads = jax.value_and_grad(loss_fn)(state.online)
        updates, opt_state = tx.update(grads, state.opt_state, state.online)
        online = optax.apply_updates(state.online, updates)

        m = momentum_at(state.step)
        target = jax.tree_util.tree_map(
            lambda t, o: m * t + (1.0 - m) * o.astype(t.dtype),
            state.target,
            {k: online[k] for k in state.target},
        )

        b = x1.shape[0]
        queue1 = jax.lax.dynamic_update_slice(
            state.queue1, k1, (state.ptr, 0)
        )
        queue2 = jax.lax.dynamic_update_slice(
            state.queue2, k2, (state.ptr, 0)
        )
        ptr = (state.ptr + b) % (state.queue1.shape[0] - b + 1)
        return (
            MobyState(
                online,
                target,
                opt_state,
                queue1,
                queue2,
                ptr,
                state.step + 1,
            ),
            loss,
        )

    return jax.jit(step_fn, donate_argnums=(0,))

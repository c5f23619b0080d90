"""Cached-backbone sweeps — a TPU-first speedup the reference cannot do.

Observation: the lr x wd sweep re-runs the ENTIRE frozen backbone for
every one of its ~78 cells (SURVEY §3.1).  When the first trainable layer
sits at depth K > 0 — AdapterDrop (block 11), transformer probe (block 12
= after the backbone), first_attention/first_mlp (block 1), linear probe
(K = L) — blocks [0, K) are identical across all cells and epochs.  At
few-shot scale the block-K activations fit in HBM (500 images x 197 x 768
bf16 = 150 MB), so we compute them ONCE and train only the suffix.

For AdapterDrop this turns a 12-block forward+backward per step into a
1-block one (~12x per-cell speedup); for the transformer probe the whole
backbone disappears from the training loop.
"""

from __future__ import annotations

import logging
import re
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

logger = logging.getLogger(__name__)


def first_trainable_layer(mask, num_layers: int) -> int:
    """Depth of the first backbone block containing a trainable leaf.

    Returns 0 when anything before/at block 0 trains (embeddings, prompts,
    ln_pre, block 0) — caching impossible; returns num_layers when only
    the head (or an extra probe block) trains.
    """
    flat = traverse_util.flatten_dict(mask, sep="/")
    cut = num_layers
    for path, trainable in flat.items():
        if not trainable:
            continue
        if path.startswith("classifier/"):
            continue
        m = re.search(r"blocks_(\d+)/", path)
        if m:
            layer = int(m.group(1))
            if layer >= num_layers:
                continue  # extra probe block sits after the backbone
            cut = min(cut, layer)
        else:
            # trainable embedding/ln_pre/prompt/etc -> prefix not frozen
            return 0
    return cut


def precompute_prefix_tokens(
    model,
    params,
    x: np.ndarray,
    cut: int,
    batch_size: int = 64,
) -> np.ndarray:
    """Frozen activations after block `cut-1` for every image."""

    @jax.jit
    def prefix(x):
        return model.backbone.apply(
            {"params": params["backbone"]},
            x,
            True,  # deterministic
            False,
            0,
            cut,  # start_layer=0, stop_layer=cut
        )

    outs = []
    for i in range(0, x.shape[0], batch_size):
        outs.append(np.asarray(prefix(jnp.asarray(x[i : i + batch_size]))))
    return np.concatenate(outs)


def make_suffix_apply(model, cut: int):
    """apply_fn over token inputs resuming at block `cut`."""

    def apply_fn(variables, tokens, train, **kw):
        # **kw forwards mutable=["batch_stats"]: the channel_bn head
        # lives in the trained suffix, so BN state threads through here
        return model.apply(variables, tokens, train, start_layer=cut, **kw)

    return apply_fn


def maybe_cache_prefix(
    cfg, model, params, mask, num_layers: int, splits
) -> Optional[Tuple]:
    """Returns (apply_fn, token_splits, cut) when caching applies, else
    None.  token_splits mirrors data.pipeline.Splits with token arrays."""
    if not bool(cfg.TRAIN.get("CACHE_FROZEN_PREFIX", True)):
        return None
    # only the layer-addressable ViT supports prefix/suffix splitting
    if getattr(model, "backbone", None) is None or getattr(
        model.backbone, "style", None
    ) not in ("clip", "timm"):
        return None
    if getattr(model.backbone, "scan_layers", False):
        # scan uses stacked block params; the prefix/suffix split needs
        # the unrolled layout (and scan targets all-layer methods anyway)
        return None
    cut = first_trainable_layer(mask, num_layers)
    if cut <= 0:
        return None
    batch = int(cfg.TEST.BATCH_SIZE_PER_GPU)
    logger.info(
        "=> cached-backbone sweep: frozen prefix through block %d "
        "computed once; cells train the suffix only",
        cut - 1,
    )
    import dataclasses

    tok = {
        f: precompute_prefix_tokens(
            model, params, getattr(splits, f), cut, batch
        )
        for f in ("x_train", "x_val", "x_test")
        if getattr(splits, f).size
    }
    new_splits = dataclasses.replace(splits, **tok)
    return make_suffix_apply(model, cut), new_splits, cut

"""SSL-Swin: the self-supervised Swin backbone + helpers.

Reference: full_shot/main/lib/models/ssl_swin.py:574-956 — a Swin
backbone variant used as the MoBY/EsViT student/teacher with
* ``ape`` / ``patch_norm`` options (:600-631)
* a teacher built with ``drop_path_rate = 0`` (get_cls_model :931-940)
* multi-crop list forward: crops grouped by resolution, one forward per
  group, outputs concatenated (:700-739)
* ``forward_return_n_last_blocks``: linear-eval features = concatenated
  avg-pooled features of the n last blocks (:775-814)

The backbone itself is ``models.swin.SwinTransformer`` (ape/patch_norm/
drop_path_rate fields, ``n_last_blocks`` call arg); this module adds the
builders and the multi-crop driver.  The MoBY training objective lives
in ``engine.ssl``.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp

from ..peft.spec import PEFTSpec
from .swin import SwinTransformer


def build_ssl_swin(cfg, is_teacher: bool = False) -> SwinTransformer:
    """get_cls_model (ssl_swin.py:931-956): the teacher runs without
    stochastic depth."""
    s = cfg.MODEL.SPEC
    v = s.VISION if "VISION" in s else s
    dtype = (
        jnp.bfloat16
        if str(cfg.TPU.COMPUTE_DTYPE) == "bfloat16"
        and jax.default_backend() == "tpu"
        else jnp.float32
    )
    return SwinTransformer(
        image_size=int(cfg.TRAIN.IMAGE_SIZE[0]),
        patch_size=int(v.get("PATCH_SIZE", 4)),
        embed_dim=int(v.get("DIM_EMBED", v.get("EMBED_DIM", 96))),
        depths=tuple(v.get("DEPTHS", (2, 2, 6, 2))),
        num_heads=tuple(v.get("NUM_HEADS", (3, 6, 12, 24))),
        window_size=int(v.get("WINDOW_SIZE", 7)),
        mlp_ratio=float(v.get("MLP_RATIO", 4.0)),
        ape=bool(v.get("USE_APE", False)),
        patch_norm=bool(v.get("PATCH_NORM", True)),
        drop_path_rate=0.0
        if is_teacher
        else float(v.get("DROP_PATH_RATE", 0.0)),
        spec=PEFTSpec(),
        use_flash=bool(cfg.TPU.FLASH_ATTENTION)
        and jax.default_backend() == "tpu",
        dtype=dtype,
    )


def multi_crop_forward(
    apply_fn, params, crops: Sequence[jax.Array], deterministic: bool = True
) -> jax.Array:
    """Forward a list of crops, one compiled call per distinct resolution
    (ssl_swin.py forward:700-739): consecutive same-resolution crops are
    concatenated into one batch; outputs are re-concatenated in order."""
    outs: List[jax.Array] = []
    group: List[jax.Array] = []
    group_res = None
    for crop in list(crops) + [None]:
        res = None if crop is None else crop.shape[1]
        if group and res != group_res:
            outs.append(
                apply_fn(params, jnp.concatenate(group), deterministic)
            )
            group = []
        if crop is not None:
            group.append(crop)
            group_res = res
    return jnp.concatenate(outs)


def extract_n_last_blocks(
    model: SwinTransformer, params, x: jax.Array, n: int
) -> jax.Array:
    """Linear-eval features: concat of avg-pooled last-n-block outputs."""
    return model.apply({"params": params}, x, True, n)

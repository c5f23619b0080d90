"""Image preprocessing.

Reference eval transform (feature.py:516-530): Resize(size, BICUBIC) ->
CenterCrop(size) -> ToTensor -> Normalize(mean, std).  Train-time augments
(full-shot AUG group): RandomResizedCrop + flip (+ color jitter in timm
mode).

Two tiers:

* host (numpy/PIL) — decode + resize on the CPU feeder threads;
* device (jax) — `normalize_batch` and random crop/flip run on-TPU inside
  the step (HBM-friendly: uint8 in, bf16 out; 4x less host->device
  traffic than shipping fp32).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# -- host side ---------------------------------------------------------------


def resize_center_crop(img, size: int):
    """PIL path: Resize(shorter=size, bicubic) -> CenterCrop(size)."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    w, h = img.size
    short = min(w, h)
    nw, nh = round(w * size / short), round(h * size / short)
    img = img.resize((nw, nh), Image.BICUBIC)
    left = (nw - size) // 2
    top = (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    return np.asarray(img.convert("RGB"), np.uint8)


def to_normalized_array(
    img_u8: np.ndarray,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
) -> np.ndarray:
    x = img_u8.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


# -- device side -------------------------------------------------------------


def normalize_batch(
    batch_u8: jax.Array,
    mean: Sequence[float] = IMAGENET_MEAN,
    std: Sequence[float] = IMAGENET_STD,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """uint8 NHWC -> normalized dtype, fused on device."""
    mean_arr = jnp.asarray(mean, jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray(std, jnp.float32) * 255.0)
    x = batch_u8.astype(jnp.float32)
    return ((x - mean_arr) * inv_std).astype(dtype)


def random_flip(rng: jax.Array, batch: jax.Array) -> jax.Array:
    flips = jax.random.bernoulli(rng, 0.5, (batch.shape[0], 1, 1, 1))
    return jnp.where(flips, batch[:, :, ::-1, :], batch)


def random_crop_resize(
    rng: jax.Array,
    batch: jax.Array,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (0.75, 4.0 / 3.0),
) -> jax.Array:
    """RandomResizedCrop on device: per-image random box -> bilinear resize
    back to the input size.  Static shapes: the crop is expressed as a
    scale/translate of the resize, not a dynamic slice."""
    b, h, w, c = batch.shape
    k_area, k_ratio, k_x, k_y = jax.random.split(rng, 4)
    area = jax.random.uniform(
        k_area, (b,), minval=scale[0], maxval=scale[1]
    )
    log_r = jax.random.uniform(
        k_ratio,
        (b,),
        minval=jnp.log(ratio[0]),
        maxval=jnp.log(ratio[1]),
    )
    r = jnp.exp(log_r)
    ch = jnp.sqrt(area / r)  # crop height fraction
    cw = jnp.sqrt(area * r)
    ch = jnp.minimum(ch, 1.0)
    cw = jnp.minimum(cw, 1.0)
    ty = jax.random.uniform(k_y, (b,)) * (1.0 - ch)
    tx = jax.random.uniform(k_x, (b,)) * (1.0 - cw)

    def crop_one(img, ch, cw, ty, tx):
        # map output pixel grid to input coordinates
        ys = (ty + ch * (jnp.arange(h) + 0.5) / h) * h - 0.5
        xs = (tx + cw * (jnp.arange(w) + 0.5) / w) * w - 0.5
        return _bilinear_gather(img, ys, xs)

    return jax.vmap(crop_one)(batch, ch, cw, ty, tx)


def _bilinear_gather(img: jax.Array, ys: jax.Array, xs: jax.Array):
    h, w, _ = img.shape
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = jnp.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = img[y0][:, x0]
    b_ = img[y0][:, x1]
    c_ = img[y1][:, x0]
    d = img[y1][:, x1]
    top = a * (1 - wx) + b_ * wx
    bot = c_ * (1 - wx) + d * wx
    return top * (1 - wy) + bot * wy

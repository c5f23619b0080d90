"""Device-side RandAugment + RandomErasing (the AUG.TIMM_AUG suite).

The reference's full-shot trainer uses the timm loader's CPU-side
augmentation (`AUG.TIMM_AUG`: AUTO_AUGMENT rand-m9-mstd0.5-inc1,
RE_PROB/RE_MODE random erasing — e.g. experiments/imagenet/vit_conv/*.yaml).
TPU-native re-design: every op is jittable jax on the raw [0, 255] float
batch INSIDE the train step — the host ships uint8 (4x less PCIe/ICI
traffic than normalized fp32) and the VPU does the pixel math, fused by
XLA into the step.

Ops follow the timm/AutoAugment definitions (magnitude in [0, 10],
gaussian magnitude jitter ``mstd``, '-inc1' increasing-with-magnitude
mappings): identity, autocontrast, equalize, invert, rotate, posterize,
solarize, solarize_add, color, contrast, brightness, sharpness,
shear_x/y, translate_x/y.  Geometric ops use a bilinear inverse-affine
resample with grey (128) fill.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_FILL = 128.0


# ---------------------------------------------------------------------------
# pixel ops (x: (H, W, 3) float32 in [0, 255])
# ---------------------------------------------------------------------------


def _blend(a, b, factor):
    return jnp.clip(b + (a - b) * factor, 0.0, 255.0)


def _identity(x, _m):
    return x


def _invert(x, _m):
    return 255.0 - x


def _autocontrast(x, _m):
    lo = x.min(axis=(0, 1), keepdims=True)
    hi = x.max(axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    return jnp.where(hi > lo, jnp.clip((x - lo) * scale, 0, 255), x)


def _equalize(x, _m):
    # per-channel histogram equalization (PIL semantics approximated with
    # a 256-bin CDF LUT)
    def chan(c):
        hist = jnp.zeros(256).at[c.astype(jnp.int32).reshape(-1)].add(1.0)
        cdf = jnp.cumsum(hist)
        n = cdf[-1]
        cdf_min = cdf[jnp.argmax(hist > 0)]
        lut = jnp.clip(
            (cdf - cdf_min) / jnp.maximum(n - cdf_min, 1.0) * 255.0,
            0,
            255,
        )
        return lut[c.astype(jnp.int32)]

    return jnp.stack(
        [chan(x[..., i]) for i in range(3)], axis=-1
    ).astype(x.dtype)


def _posterize(x, m):
    # '-inc1': more magnitude = fewer bits kept (4 -> 0)
    bits = 4 - (m / 10.0 * 4.0)
    shift = jnp.clip(8.0 - bits, 0.0, 8.0)
    q = jnp.exp2(shift)
    return jnp.floor(x / q) * q


def _solarize(x, m):
    thresh = 256.0 - m / 10.0 * 256.0
    return jnp.where(x < thresh, x, 255.0 - x)


def _solarize_add(x, m):
    add = m / 10.0 * 110.0
    return jnp.where(x < 128.0, jnp.clip(x + add, 0, 255), x)


def _enhance_factor(m):
    # timm '-inc1': factor = 1 +- m/10 * 0.9 (random sign handled by the
    # caller passing signed magnitude)
    return 1.0 + m / 10.0 * 0.9


def _color(x, m):
    grey = x.mean(axis=-1, keepdims=True) * jnp.ones_like(x)
    return _blend(x, grey, _enhance_factor(m))


def _contrast(x, m):
    mean = x.mean()
    return _blend(x, jnp.full_like(x, mean), _enhance_factor(m))


def _brightness(x, m):
    return _blend(x, jnp.zeros_like(x), _enhance_factor(m))


def _sharpness(x, m):
    k = jnp.asarray(
        [[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]
    ) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        x.transpose(2, 0, 1)[:, None],  # (3, 1, H, W)
        k[None, None],
        (1, 1),
        "SAME",
    )[:, 0].transpose(1, 2, 0)
    return _blend(x, smoothed, _enhance_factor(m))


# ---------------------------------------------------------------------------
# geometric ops: inverse-affine bilinear resample, grey fill
# ---------------------------------------------------------------------------


def _affine(x, mat: jnp.ndarray):
    """x (H, W, C); mat is the INVERSE 2x3 affine (out -> in coords)."""
    h, w = x.shape[0], x.shape[1]
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = yy - cy
    xs = xx - cx
    in_x = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2] + cx
    in_y = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2] + cy
    x0 = jnp.floor(in_x)
    y0 = jnp.floor(in_y)
    fx = in_x - x0
    fy = in_y - y0

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = x[yi, xi]
        return jnp.where(valid[..., None], vals, _FILL)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _rotate(x, m):
    deg = m / 10.0 * 30.0
    rad = deg * jnp.pi / 180.0
    c, s = jnp.cos(rad), jnp.sin(rad)
    mat = jnp.asarray([[c, -s, 0.0], [s, c, 0.0]])
    return _affine(x, mat)


def _shear_x(x, m):
    sh = m / 10.0 * 0.3
    return _affine(x, jnp.asarray([[1.0, sh, 0.0], [0.0, 1.0, 0.0]]))


def _shear_y(x, m):
    sh = m / 10.0 * 0.3
    return _affine(x, jnp.asarray([[1.0, 0.0, 0.0], [sh, 1.0, 0.0]]))


def _translate_x(x, m):
    t = m / 10.0 * 0.45 * x.shape[1]
    return _affine(x, jnp.asarray([[1.0, 0.0, t], [0.0, 1.0, 0.0]]))


def _translate_y(x, m):
    t = m / 10.0 * 0.45 * x.shape[0]
    return _affine(x, jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, t]]))


_OPS = (
    _identity,
    _autocontrast,
    _equalize,
    _invert,
    _rotate,
    _posterize,
    _solarize,
    _solarize_add,
    _color,
    _contrast,
    _brightness,
    _sharpness,
    _shear_x,
    _shear_y,
    _translate_x,
    _translate_y,
)
# ops whose magnitude sign matters (rotation/shear/translate/enhance)
_SIGNED = (0, 0, 0, 0, 1, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1)


def rand_augment(
    rng: jax.Array,
    batch: jax.Array,
    num_ops: int = 2,
    magnitude: float = 9.0,
    mag_std: float = 0.5,
) -> jax.Array:
    """rand-m{magnitude}-mstd{mag_std} over a (B, H, W, 3) [0,255] batch:
    per image, ``num_ops`` ops drawn uniformly, magnitude jittered with a
    gaussian of std ``mag_std``, random sign for the signed ops."""

    signed = jnp.asarray(_SIGNED, jnp.float32)

    def one_op(x, key):
        k_op, k_mag, k_sign = jax.random.split(key, 3)
        op_idx = jax.random.randint(k_op, (), 0, len(_OPS))
        m = jnp.clip(
            magnitude + mag_std * jax.random.normal(k_mag), 0.0, 10.0
        )
        sign = jnp.where(
            (jax.random.uniform(k_sign) < 0.5) & (signed[op_idx] > 0),
            -1.0,
            1.0,
        )
        return jax.lax.switch(
            op_idx, [partial(f) for f in _OPS], x, m * sign
        )

    def one_image(x, key):
        keys = jax.random.split(key, num_ops)

        def body(x, k):
            return one_op(x, k), None

        x, _ = jax.lax.scan(body, x, keys)
        return x

    keys = jax.random.split(rng, batch.shape[0])
    return jax.vmap(one_image)(batch.astype(jnp.float32), keys)


def random_erasing(
    rng: jax.Array,
    batch: jax.Array,
    prob: float = 0.25,
    area_range: Tuple[float, float] = (0.02, 1.0 / 3.0),
    mode: str = "pixel",
) -> jax.Array:
    """timm RandomErasing: erase a random rect with gaussian pixels
    ('pixel' mode) or the grey fill ('const')."""
    b, h, w, c = batch.shape

    def one(x, key):
        k_p, k_a, k_r, k_y, k_x, k_n = jax.random.split(key, 6)
        area = h * w * jax.random.uniform(
            k_a, minval=area_range[0], maxval=area_range[1]
        )
        ratio = jnp.exp(
            jax.random.uniform(
                k_r, minval=jnp.log(0.3), maxval=jnp.log(1 / 0.3)
            )
        )
        eh = jnp.clip(jnp.sqrt(area * ratio), 1, h - 1)
        ew = jnp.clip(jnp.sqrt(area / ratio), 1, w - 1)
        y0 = jax.random.uniform(k_y) * (h - eh)
        x0 = jax.random.uniform(k_x) * (w - ew)
        yy, xx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        inside = (
            (yy >= y0) & (yy < y0 + eh) & (xx >= x0) & (xx < x0 + ew)
        )[..., None]
        if mode == "pixel":
            fill = 128.0 + 50.0 * jax.random.normal(k_n, x.shape)
            fill = jnp.clip(fill, 0.0, 255.0)
        else:
            fill = jnp.full_like(x, _FILL)
        erased = jnp.where(inside, fill, x)
        return jnp.where(jax.random.uniform(k_p) < prob, erased, x)

    keys = jax.random.split(rng, b)
    return jax.vmap(one)(batch.astype(jnp.float32), keys)


def make_train_transform(cfg):
    """(rng, u8_or_float_batch) -> normalized float batch, per AUG.TIMM_AUG
    (returns None when the timm transform is disabled)."""
    t = cfg.AUG.TIMM_AUG
    if not (bool(t.get("USE_TRANSFORM", False)) or bool(
        t.get("USE_LOADER", False)
    )):
        return None
    aa = str(t.get("AUTO_AUGMENT", "rand-m9-mstd0.5-inc1") or "")
    num_ops, mag, mstd = 2, 9.0, 0.5
    for part in aa.split("-"):
        if part.startswith("m") and part[1:].replace(".", "").isdigit():
            mag = float(part[1:])
        elif part.startswith("mstd"):
            mstd = float(part[4:])
        elif part.startswith("n") and part[1:].isdigit():
            num_ops = int(part[1:])
    re_prob = float(t.get("RE_PROB", 0.0))
    re_mode = str(t.get("RE_MODE", "pixel"))
    hflip = float(t.get("HFLIP", 0.5))
    mean = jnp.asarray(cfg.INPUT.MEAN, jnp.float32) * 255.0
    std = jnp.asarray(cfg.INPUT.STD, jnp.float32) * 255.0

    def transform(rng, x):
        x = x.astype(jnp.float32)
        k_f, k_a, k_e = jax.random.split(rng, 3)
        if hflip > 0:
            flip = jax.random.uniform(k_f, (x.shape[0], 1, 1, 1)) < hflip
            x = jnp.where(flip, x[:, :, ::-1, :], x)
        if aa:
            x = rand_augment(k_a, x, num_ops, mag, mstd)
        if re_prob > 0:
            x = random_erasing(k_e, x, re_prob, mode=re_mode)
        return (x - mean) / std

    return transform

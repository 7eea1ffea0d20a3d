"""Device-side RandAugment + Cutout (the FixMatch strong-augmentation policy).

The reference has no augmentation beyond flip/rotate (its transform stack is
torchvision Resize/Flip/Rotation — reference src/training/common.py:96-119);
this module implements the *actual* strong augmentation of the FixMatch
recipe the semi-supervised CLI exposes via ``--consistency-weight``
(Sohn et al. 2020, Table 12: RandAugment pool + Cutout), as an optional
upgrade over the default brightness/contrast jitter (``--strong-augment
randaugment``).

TPU-first design — everything below is one jittable, static-shape program:

* **One warp per layer, not one per op.** The five geometric ops (rotate,
  shear-x/y, translate-x/y) share a single per-image inverse-affine
  nearest-neighbor warp: each image's selected op parameterizes a 2x2
  fixed-point matrix + offset (identity when a pixel op was drawn), and the
  batch takes ONE flat gather (`ops.augment._rotate_gather`) regardless of
  pool size. Data-dependent *op choice* thus never becomes data-dependent
  *control flow* — XLA sees a fixed pipeline.
* **Pixel-op bank + masked select.** The nine pixel ops (identity,
  autocontrast, equalize, posterize, solarize, color, contrast, brightness,
  sharpness) are computed on the whole batch and combined with a
  ``jnp.where`` chain keyed on the per-image op index. Elementwise ops fuse;
  the only non-fused work is equalize's 256-bin scatter-add histogram and
  one LUT gather.
* **Integer-exact PIL semantics.** Pixel ops reproduce PIL's 8-bit LUT
  arithmetic in integer form (autocontrast's truncating rescale, equalize's
  ``(step//2 + cumsum) // step`` LUT, the ITU-R 601-2 luma used by
  Color/Contrast, the 3x3/13 SMOOTH kernel with copied borders used by
  Sharpness) — oracle-tested against PIL in tests/test_randaugment.py.
* **FixMatch magnitude sampling.** Like FixMatch (not torchvision's fixed
  bin), each applied op draws its magnitude uniformly from the full range,
  with a random sign for the signed ops.

Pixel values travel as integer-valued f32 in [0, 255] between ops (each op
rounds back to the integer lattice, as PIL's u8 domain does), so op
composition matches PIL's composition.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ssip_tpu.ops.augment import _rotate_gather, random_flip
from ssip_tpu.ops.resize import normalize_imagenet_u8

# FixMatch pool (Sohn et al. 2020, Table 12). Order fixes the op indices the
# PRNG draws; geometric ops lead so `op < _N_GEO` gates the warp parameters.
_GEO_OPS = ("rotate", "shear_x", "shear_y", "translate_x", "translate_y")
_PIXEL_OPS = (
    "identity", "autocontrast", "equalize", "posterize", "solarize",
    "color", "contrast", "brightness", "sharpness",
)
_N_GEO = len(_GEO_OPS)
NUM_OPS = _N_GEO + len(_PIXEL_OPS)

# Maximum magnitudes (the FixMatch / RandAugment ranges).
MAX_ROTATE_DEG = 30.0
MAX_SHEAR = 0.3          # shear coefficient (PIL affine matrix entry)
MAX_TRANSLATE = 0.3      # fraction of the image side
MAX_ENHANCE = 0.9        # Brightness/Color/Contrast/Sharpness: 1 +/- 0.9
MAX_POSTERIZE_DROP = 4   # bits kept ranges 8 -> 4
_FIX_Q = 1 << 16         # fixed-point scale shared with ops/augment.py


def _affine_nearest(
    images: jnp.ndarray,
    m00: jnp.ndarray, m01: jnp.ndarray,
    m10: jnp.ndarray, m11: jnp.ndarray,
    oy: jnp.ndarray, ox: jnp.ndarray,
) -> jnp.ndarray:
    """Per-image inverse-affine NN warp about the image center, zero fill.

    ``src = M_inv @ (dst - c) + c + o`` with ``c = ((h-1)/2, (w-1)/2)``.
    The map is evaluated in the same 2^-16 fixed-point integer arithmetic as
    ``ops.augment._rotation_index_map`` (doubled coordinates, exact floor),
    so identical inputs produce bit-identical index maps under any XLA
    fusion choice. All six parameters are per-image ``[B]`` f32; a row of
    (1, 0, 0, 1, 0, 0) is an exact identity.
    """
    b, h, w, _ = images.shape
    q = _FIX_Q
    im00 = jnp.round(m00 * q).astype(jnp.int32)[:, None, None]
    im01 = jnp.round(m01 * q).astype(jnp.int32)[:, None, None]
    im10 = jnp.round(m10 * q).astype(jnp.int32)[:, None, None]
    im11 = jnp.round(m11 * q).astype(jnp.int32)[:, None, None]
    ioy2 = jnp.round(2.0 * oy * q).astype(jnp.int32)[:, None, None]
    iox2 = jnp.round(2.0 * ox * q).astype(jnp.int32)[:, None, None]
    yy2 = (2 * jnp.arange(h, dtype=jnp.int32) - (h - 1))[:, None]  # 2(y-cy)
    xx2 = (2 * jnp.arange(w, dtype=jnp.int32) - (w - 1))[None, :]
    ay = im00 * yy2 + im01 * xx2 + ioy2  # [B,H,W] = 2q*(src_y - cy)
    ax = im10 * yy2 + im11 * xx2 + iox2
    iy = (ay + h * q) // (2 * q)  # floor(src_y + 1/2), exact in ints
    ix = (ax + w * q) // (2 * q)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    return _rotate_gather(images, iy, ix, valid)


def _geo_params(
    op: jnp.ndarray, mag: jnp.ndarray, sign: jnp.ndarray, h: int, w: int
) -> Tuple[jnp.ndarray, ...]:
    """Inverse-affine parameters for the selected geometric op (else identity).

    Exactly one geometric op is active per image, so each op's inverse is
    written directly (rotate^-1 = rotate(-t), shear^-1 negates the
    coefficient, translate^-1 negates the shift) — no matrix inversion.
    """
    v = sign * mag  # signed magnitude in [-1, 1]
    theta = jnp.where(op == 0, v * (MAX_ROTATE_DEG * jnp.pi / 180.0), 0.0)
    shx = jnp.where(op == 1, v * MAX_SHEAR, 0.0)  # x' = x + s*y
    shy = jnp.where(op == 2, v * MAX_SHEAR, 0.0)  # y' = y + s*x
    # PIL/torchvision translate by whole pixels
    tx = jnp.where(op == 3, jnp.round(v * MAX_TRANSLATE * w), 0.0)
    ty = jnp.where(op == 4, jnp.round(v * MAX_TRANSLATE * h), 0.0)

    cos = jnp.cos(theta)
    sin = jnp.sin(theta)
    # Row basis (y, x): rotation matches ops/augment.py's screen-CCW map;
    # at most one of {theta, shx, shy} is nonzero so the factors commute.
    m00 = cos
    m01 = sin - shy
    m10 = -sin - shx
    m11 = cos
    return m00, m01, m10, m11, -ty, -tx


# ---------------------------------------------------------------------------
# Pixel ops. Input/output: integer-valued f32 in [0, 255], shape [B, H, W, 3].
# ---------------------------------------------------------------------------


def _luma601(x: jnp.ndarray) -> jnp.ndarray:
    """PIL ``convert("L")`` luma: (19595 R + 38470 G + 7471 B + 2^15) >> 16."""
    xi = x.astype(jnp.int32)
    l24 = 19595 * xi[..., 0] + 38470 * xi[..., 1] + 7471 * xi[..., 2] + 32768
    return (l24 >> 16).astype(jnp.float32)


def _blend(degenerate: jnp.ndarray, x: jnp.ndarray, factor: jnp.ndarray):
    """PIL ImageEnhance blend: d + f*(x-d), round-half-up, clip to [0, 255]."""
    f = factor.reshape(-1, 1, 1, 1)
    out = degenerate + f * (x - degenerate)
    return jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)


def _op_brightness(x: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    return _blend(jnp.zeros_like(x), x, factor)


def _op_color(x: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    gray = _luma601(x)[..., None]  # degenerate = L, replicated to RGB
    return _blend(jnp.broadcast_to(gray, x.shape), x, factor)


def _op_contrast(x: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    # PIL: degenerate = solid gray at round(mean of the L image)
    mean = jnp.floor(jnp.mean(_luma601(x), axis=(1, 2)) + 0.5)
    return _blend(mean[:, None, None, None], x, factor)


def _op_sharpness(x: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    # PIL SMOOTH: 3x3 kernel [[1,1,1],[1,5,1],[1,1,1]]/13, interior only
    # (PIL's ImagingFilter copies the 1px border from the source).
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = (
        p[:, :-2, :-2] + p[:, :-2, 1:-1] + p[:, :-2, 2:]
        + p[:, 1:-1, :-2] + 5.0 * x + p[:, 1:-1, 2:]
        + p[:, 2:, :-2] + p[:, 2:, 1:-1] + p[:, 2:, 2:]
    )
    smooth = jnp.clip(jnp.floor(acc / 13.0 + 0.5), 0.0, 255.0)
    out = _blend(smooth, x, factor)
    # copy borders back (degenerate == source there, but blend re-rounds)
    border = jnp.ones((x.shape[1], x.shape[2]), dtype=bool)
    border = border.at[1:-1, 1:-1].set(False)
    return jnp.where(border[None, :, :, None], x, out)


def _op_posterize(x: jnp.ndarray, mag: jnp.ndarray) -> jnp.ndarray:
    drop = jnp.round(mag * MAX_POSTERIZE_DROP).astype(jnp.int32)  # [B] 0..4
    mask = (255 // (1 << drop)) * (1 << drop)  # keep top (8-drop) bits
    xi = x.astype(jnp.int32) & mask[:, None, None, None]
    return xi.astype(jnp.float32)


def _op_solarize(x: jnp.ndarray, mag: jnp.ndarray) -> jnp.ndarray:
    # FixMatch range [0, 256]: mag=0 -> threshold 256 -> exact identity
    thresh = jnp.round(256.0 * (1.0 - mag))[:, None, None, None]
    return jnp.where(x < thresh, x, 255.0 - x)


def _op_autocontrast(x: jnp.ndarray) -> jnp.ndarray:
    # PIL autocontrast (cutoff=0): per channel, stretch [lo, hi] -> [0, 255]
    # with a truncating LUT; identity when the channel is constant. Done in
    # exact integer arithmetic: floor((v-lo)*255 / (hi-lo)).
    xi = x.astype(jnp.int32)
    lo = jnp.min(xi, axis=(1, 2), keepdims=True)
    hi = jnp.max(xi, axis=(1, 2), keepdims=True)
    span = jnp.maximum(hi - lo, 1)
    out = ((xi - lo) * 255) // span
    return jnp.where(hi > lo, out, xi).astype(jnp.float32)


def _op_equalize(x: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageOps.equalize: per-channel histogram-equalization LUT.

    ``lut[i] = (step//2 + sum(h[:i])) // step`` with
    ``step = (npix - h[last nonzero]) // 255``; identity when step == 0.
    Histograms are 256-bin scatter-adds per (image, channel); the LUT
    application is one flat take (same trick as the rotation gather).
    """
    b, h, w, c = x.shape
    xi = x.astype(jnp.int32)
    v = jnp.moveaxis(xi, -1, 1).reshape(b * c, h * w)  # [BC, HW]

    def hist_one(vals):
        return jnp.zeros((256,), jnp.int32).at[vals].add(1)

    hist = jax.vmap(hist_one)(v)  # [BC, 256]
    npix = h * w
    last_nz = 255 - jnp.argmax((hist > 0)[:, ::-1], axis=1)  # [BC]
    cnt_last = jnp.take_along_axis(hist, last_nz[:, None], axis=1)[:, 0]
    step = (npix - cnt_last) // 255  # [BC]
    csum = jnp.cumsum(hist, axis=1) - hist  # sum(h[:i]) exclusive
    ident = jnp.arange(256, dtype=jnp.int32)[None, :]
    lut = jnp.clip(
        (step[:, None] // 2 + csum) // jnp.maximum(step, 1)[:, None], 0, 255
    )
    lut = jnp.where((step > 0)[:, None], lut, ident)  # [BC, 256]
    flat_idx = v + (jnp.arange(b * c, dtype=jnp.int32) * 256)[:, None]
    out = jnp.take(lut.reshape(-1), flat_idx.reshape(-1)).reshape(b * c, h * w)
    return jnp.moveaxis(
        out.reshape(b, c, h, w), 1, -1
    ).astype(jnp.float32)


def _apply_pixel_bank(
    x: jnp.ndarray, op: jnp.ndarray, mag: jnp.ndarray, sign: jnp.ndarray
) -> jnp.ndarray:
    """Compute the nine pixel ops and select per image by op index.

    ``op`` indexes the full pool; pixel ops occupy [_N_GEO, NUM_OPS). Images
    whose op was geometric take the identity branch here (the warp already
    applied their op).
    """
    enh = 1.0 + sign * mag * MAX_ENHANCE  # enhancement factor in [0.1, 1.9]
    candidates = (
        x,                        # identity (and the geometric-op images)
        _op_autocontrast(x),
        _op_equalize(x),
        _op_posterize(x, mag),
        _op_solarize(x, mag),
        _op_color(x, enh),
        _op_contrast(x, enh),
        _op_brightness(x, enh),
        _op_sharpness(x, enh),
    )
    out = candidates[0]
    for i, cand in enumerate(candidates[1:], start=1):
        sel = (op == _N_GEO + i)[:, None, None, None]
        out = jnp.where(sel, cand, out)
    return out


def randaugment(
    images_u8: jnp.ndarray,
    key: jax.Array,
    num_layers: int = 2,
) -> jnp.ndarray:
    """Apply ``num_layers`` randomly-drawn ops per image. [B,H,W,3] u8 -> u8.

    Per layer and image: one op uniform over the 14-op FixMatch pool, with
    magnitude ~ U(0, 1) of the op's full range and a random sign — the
    FixMatch sampling scheme (random magnitude each step), not torchvision's
    fixed-bin variant.
    """
    b, h, w, _ = images_u8.shape
    x = images_u8.astype(jnp.float32)
    for layer in range(num_layers):
        key, k_op, k_mag, k_sign = jax.random.split(key, 4)
        op = jax.random.randint(k_op, (b,), 0, NUM_OPS)
        mag = jax.random.uniform(k_mag, (b,))
        sign = jnp.where(
            jax.random.bernoulli(k_sign, 0.5, (b,)), 1.0, -1.0
        )
        g_op = jnp.where(op < _N_GEO, op, -1)
        m00, m01, m10, m11, oy, ox = _geo_params(g_op, mag, sign, h, w)
        x = _affine_nearest(
            x, m00, m01, m10, m11, oy, ox
        )  # identity rows for pixel-op images
        x = _apply_pixel_bank(x, op, mag, sign)
    return jnp.clip(x, 0.0, 255.0).astype(jnp.uint8)


def cutout(
    images_u8: jnp.ndarray,
    key: jax.Array,
    fraction: float = 0.5,
    fill: int = 127,
) -> jnp.ndarray:
    """FixMatch CutoutAbs: one gray square per image, center uniform, clipped.

    The square has side ``fraction * min(H, W)`` centered at a uniform pixel
    (so up to 3/4 of it can fall off the edge — FixMatch's convention),
    filled with mid-gray.
    """
    b, h, w, _ = images_u8.shape
    side = int(round(fraction * min(h, w)))
    if side == 0:
        return images_u8
    k_y, k_x = jax.random.split(key)
    cy = jax.random.randint(k_y, (b,), 0, h)
    cx = jax.random.randint(k_x, (b,), 0, w)
    yy = jnp.arange(h)[None, :, None]  # [1, H, 1]
    xx = jnp.arange(w)[None, None, :]  # [1, 1, W]
    in_y = (yy >= cy[:, None, None] - side // 2) & (
        yy < cy[:, None, None] + (side + 1) // 2
    )
    in_x = (xx >= cx[:, None, None] - side // 2) & (
        xx < cx[:, None, None] + (side + 1) // 2
    )
    mask = (in_y & in_x)[..., None]
    return jnp.where(mask, jnp.uint8(fill), images_u8)


def strong_augment_randaugment(
    images_u8: jnp.ndarray,
    key: jax.Array,
    num_layers: int = 2,
    cutout_fraction: float = 0.5,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """FixMatch 'strong' view: flip -> RandAugment(n) -> Cutout -> normalize."""
    k_flip, k_ra, k_cut = jax.random.split(key, 3)
    x = random_flip(images_u8.astype(jnp.uint8), k_flip)
    x = randaugment(x, k_ra, num_layers=num_layers)
    x = cutout(x, k_cut, fraction=cutout_fraction)
    return normalize_imagenet_u8(x, dtype=dtype)

"""PIL-compatible antialiased bilinear resize as MXU matmuls.

The reference's preprocessing chains run through PIL/torchvision on the host
(extraction: Resize(256) → CenterCrop(224), reference
src/feature_extraction.py:184-207; training: Resize((224,224)), reference
src/training/common.py:96-119). On TPU we re-express the resample as two
dense matrix products — separable triangle-filter weights contracted against
the H and W axes — which XLA maps straight onto the MXU and fuses with the
normalization epilogue.

Parity notes (validated empirically in tests/test_preprocess.py):
  - PIL resamples horizontally then vertically, clipping the intermediate to
    uint8 per pass; ``quantize=True`` emulates that, making the 512→256
    extraction resize *bitwise identical* to PIL.
  - PIL quantizes filter coefficients to fixed point; with float32 weights
    the 512→224 training resize differs by ≤1 LSB on <1% of pixels —
    far inside the ±0.01-metric parity budget.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@lru_cache(maxsize=64)
def triangle_weights(src: int, dst: int) -> np.ndarray:
    """[dst, src] PIL-bilinear (triangle, antialiased) resample matrix."""
    scale = src / dst
    filterscale = max(scale, 1.0)
    support = filterscale  # bilinear filter support is 1.0 * filterscale
    weights = np.zeros((dst, src), np.float32)
    for i in range(dst):
        center = (i + 0.5) * scale
        lo = max(int(center - support + 0.5), 0)
        hi = min(int(center + support + 0.5), src)
        js = np.arange(lo, hi)
        x = (js + 0.5 - center) / filterscale
        w = np.clip(1.0 - np.abs(x), 0.0, None)
        weights[i, lo:hi] = (w / w.sum()).astype(np.float32)
    return weights


def _quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    """PIL's per-pass clip8: round-half-up then clamp to [0, 255]."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def resize_bilinear(
    images: jnp.ndarray,
    out_h: int,
    out_w: int,
    quantize: bool = True,
    row_slice: slice | None = None,
    col_slice: slice | None = None,
) -> jnp.ndarray:
    """Antialiased bilinear resize of NHWC images (float32 result, 0..255).

    ``row_slice``/``col_slice`` crop the *output* grid by slicing the weight
    matrices — a free fused center-crop (only the kept pixels are computed).
    """
    h, w = images.shape[-3], images.shape[-2]
    wh = jnp.asarray(triangle_weights(w, out_w))
    wv = jnp.asarray(triangle_weights(h, out_h))
    if row_slice is not None:
        wv = wv[row_slice]
    if col_slice is not None:
        wh = wh[col_slice]

    x = images.astype(jnp.float32)
    # horizontal pass (W axis), then vertical (H axis) — PIL's order.
    x = jnp.einsum("...hwc,Ww->...hWc", x, wh)
    if quantize:
        x = _quantize_u8(x)
    x = jnp.einsum("...hwc,Hh->...Hwc", x, wv)
    if quantize:
        x = _quantize_u8(x)
    return x


def resize_target(h: int, w: int, resize: int) -> tuple:
    """torchvision Resize(n) output grid: short side → n, long side
    int-TRUNCATED (``int(n * long / short)`` — torchvision
    ``_compute_resized_output_size``; 427×640 @ 256 → 256×383, not 384).
    ``round()`` here would shift the whole output grid 1px on
    fractional-aspect inputs. Single source of truth for the device chain,
    the host PIL fallback (data/decode.py), and the native fused kernel
    (native/decoder.py) — keep all three on this helper so they cannot
    drift.
    """
    if h <= w:
        return resize, max(1, int(w * resize / h))
    return max(1, int(h * resize / w)), resize


def center_crop_bounds(size: int, crop: int) -> slice:
    """torchvision CenterCrop offset: round((size - crop) / 2)."""
    off = int(round((size - crop) / 2.0))
    return slice(off, off + crop)


def normalize_imagenet(x01: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(x - mean) / std on [0,1] NHWC input."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    inv_std = jnp.asarray(
        np.float32(1.0) / np.asarray(IMAGENET_STD, np.float32), jnp.float32
    )
    return ((x01 - mean) * inv_std).astype(dtype)


def normalize_imagenet_u8(x_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """ToTensor → ImageNet-normalize fused into one affine on uint8-scale
    input: ``(x − 255·mean) · 1/(255·std)``, constants precomputed in f64.

    Why not ``(x/255 − mean) * inv_std``: XLA may fold the divide-by-
    constant and contract the following subtract differently depending on
    the surrounding fusion (a ``lax.scan`` epoch body vs a per-step
    program), flipping the result by 1 ulp between two compilations of the
    *same* augmentation (measured on CPU; tests/test_fused_equivalence.py
    demands bit-equality because 1-ulp input noise compounds chaotically
    through SGD). This form is exactly one f32 subtract + one f32 multiply
    — not fma-contractible, not foldable — so every fusion context rounds
    identically. Numerics vs the torch chain shift ≤2 ulp, inside every
    parity bound.
    """
    offset = jnp.asarray(
        (255.0 * np.asarray(IMAGENET_MEAN, np.float64)).astype(np.float32)
    )
    scale = jnp.asarray(
        (1.0 / (255.0 * np.asarray(IMAGENET_STD, np.float64))).astype(np.float32)
    )
    return ((x_u8.astype(jnp.float32) - offset) * scale).astype(dtype)


def extraction_preprocess(
    images_u8: jnp.ndarray,
    resize: int = 256,
    crop: int = 224,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Deterministic extraction chain: Resize(short-side) → CenterCrop →
    ToTensor → ImageNet-normalize, fused on device.

    Semantics: reference feature_extraction.py:184-207 (and its *no RGB
    conversion* policy — callers feed already-RGB uint8; see
    data/decode.py for the channel policy).
    """
    if crop > resize:
        raise ValueError(
            f"crop ({crop}) must be <= resize ({resize}): the resized "
            "short side cannot satisfy a larger center crop"
        )
    h, w = images_u8.shape[-3], images_u8.shape[-2]
    out_h, out_w = resize_target(h, w, resize)
    x = resize_bilinear(
        images_u8,
        out_h,
        out_w,
        quantize=True,
        row_slice=center_crop_bounds(out_h, crop),
        col_slice=center_crop_bounds(out_w, crop),
    )
    return normalize_imagenet_u8(x, dtype=dtype)


def training_resize(images_u8: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """Training chain's Resize((size, size)) — returns uint8-valued f32.

    Augmentations (flip/rotate) operate on this, then normalize.
    Semantics: reference common.py:96-119.
    """
    return resize_bilinear(images_u8, image_size, image_size, quantize=True)

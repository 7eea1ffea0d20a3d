"""Device-side training augmentations.

The reference's train transform is Resize((S,S)) → RandomHorizontalFlip(0.5)
→ RandomRotation(±10°, nearest, expand=False, fill=0) → ToTensor →
ImageNet-normalize (reference: src/training/common.py:96-119, torchvision
defaults). Here the random ops run *on device* inside the jitted train step:
flips are a masked ``lax.rev`` and rotations are a nearest-neighbor inverse
affine gather — batched, shape-static, PRNG-keyed per epoch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssip_tpu.ops.resize import normalize_imagenet_u8


def random_flip(images: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Per-image horizontal flip with p=0.5. images: [B, H, W, C]."""
    flip = jax.random.bernoulli(key, 0.5, (images.shape[0],))
    flipped = jnp.flip(images, axis=2)
    return jnp.where(flip[:, None, None, None], flipped, images)


def random_rotate_nearest(
    images: jnp.ndarray, key: jax.Array, max_degrees: float = 10.0
) -> jnp.ndarray:
    """Per-image rotation by U(-max_deg, max_deg) about the center.

    Nearest-neighbor sampling, no expansion, zero fill — torchvision
    RandomRotation defaults. images: [B, H, W, C] (any numeric dtype).
    """
    b, h, w, _ = images.shape
    angles = jax.random.uniform(
        key, (b,), minval=-max_degrees, maxval=max_degrees
    ) * (jnp.pi / 180.0)

    # Inverse mapping: for each output pixel, rotate back to source coords.
    # PIL/torchvision rotate: positive angle = counter-clockwise on screen
    # (y-down coords) — the inverse pixel map is the clockwise rotation.
    #
    # The map is computed in FIXED-POINT integer arithmetic: per-pixel
    # float cos·y+sin·x is fma-contraction-sensitive, so the same epoch
    # compiled as a fused scan vs per-step programs could round a
    # boundary pixel differently and break fused==per-step equivalence
    # (tests/test_fused_equivalence.py). Quantizing cos/sin once per image
    # to 2⁻¹⁶ and doing the per-pixel work in int32 makes the index map
    # bit-identical under any XLA fusion choice (boundary shift vs exact
    # trig ≤ ~2⁻¹⁶·max(h,w)/2 px — far below the NN rounding granularity).
    q = 1 << 16
    icos = jnp.round(jnp.cos(angles) * q).astype(jnp.int32)[:, None, None]
    isin = jnp.round(jnp.sin(angles) * q).astype(jnp.int32)[:, None, None]
    yy2 = (2 * jnp.arange(h, dtype=jnp.int32) - (h - 1))[:, None]  # 2(y−cy)
    xx2 = (2 * jnp.arange(w, dtype=jnp.int32) - (w - 1))[None, :]  # 2(x−cx)
    ay = icos * yy2 + isin * xx2  # [B,H,W] = 2q·(src_y − cy)
    ax = -isin * yy2 + icos * xx2
    # iy = floor(src_y + ½) = floor((ay + h·q) / 2q), exactly, in ints
    iy = (ay + h * q) // (2 * q)
    ix = (ax + w * q) // (2 * q)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)

    # ONE flat take over the whole flattened batch: index-identical to the
    # 2-D fancy gather, but measured 4,500 imgs/s on v5e vs 2,970 for the
    # per-image (vmapped) take and 2,420 for the 2-D gather — one big
    # gather amortizes per-op index-stream setup that B separate batched
    # gathers pay repeatedly (int32 RGB-packing and take_along_axis
    # variants measured no better). This gather IS the train-step
    # augmentation cost — it runs on the scalar/DMA path, not the MXU —
    # see docs/performance.md "Training step" for the ceiling analysis.
    flat = (iy * w + ix) + (
        jnp.arange(b, dtype=jnp.int32) * (h * w)
    )[:, None, None]  # [B,H,W] global indices
    gathered = jnp.take(
        images.reshape(b * h * w, -1), flat.reshape(-1), axis=0
    ).reshape(images.shape)
    return jnp.where(valid[..., None], gathered, jnp.zeros_like(gathered))


def train_augment(
    images_u8: jnp.ndarray, key: jax.Array, rotate_degrees: float = 10.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """flip → rotate → ToTensor → normalize; input uint8-valued [B,S,S,3]."""
    k_flip, k_rot = jax.random.split(key)
    x = random_flip(images_u8, k_flip)
    x = random_rotate_nearest(x, k_rot, rotate_degrees)
    return normalize_imagenet_u8(x, dtype=dtype)


def eval_preprocess(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Eval chain: ToTensor → normalize (resize happens upstream)."""
    return normalize_imagenet_u8(images_u8, dtype=dtype)


def weak_augment(images_u8: jnp.ndarray, key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
    """FixMatch 'weak' view: horizontal flip only → normalize."""
    x = random_flip(images_u8, key)
    return normalize_imagenet_u8(x, dtype=dtype)


def strong_augment(
    images_u8: jnp.ndarray, key: jax.Array, rotate_degrees: float = 10.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """FixMatch 'strong' view: flip → rotate → brightness/contrast jitter."""
    k_flip, k_rot, k_bright, k_contrast = jax.random.split(key, 4)
    x = random_flip(images_u8, k_flip)
    x = random_rotate_nearest(x, k_rot, rotate_degrees).astype(jnp.float32)
    b = images_u8.shape[0]
    brightness = jax.random.uniform(k_bright, (b, 1, 1, 1), minval=-32.0, maxval=32.0)
    contrast = jax.random.uniform(k_contrast, (b, 1, 1, 1), minval=0.7, maxval=1.3)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = jnp.clip((x - mean) * contrast + mean + brightness, 0.0, 255.0)
    return normalize_imagenet_u8(x, dtype=dtype)

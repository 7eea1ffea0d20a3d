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

from ssip_tpu.ops.resize import normalize_imagenet


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
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] - cy  # [H,1]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] - cx  # [1,W]
    # PIL/torchvision rotate: positive angle = counter-clockwise on screen
    # (y-down coords) — the inverse pixel map is the clockwise rotation.
    cos = jnp.cos(angles)[:, None, None]
    sin = jnp.sin(angles)[:, None, None]
    src_y = cos * yy + sin * xx + cy  # [B,H,W]
    src_x = -sin * yy + cos * xx + cx

    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)

    gathered = jax.vmap(lambda img, y, x: img[y, x])(images, iy, ix)  # [B,H,W,C]
    return jnp.where(valid[..., None], gathered, jnp.zeros_like(gathered))


def train_augment(
    images_u8: jnp.ndarray, key: jax.Array, rotate_degrees: float = 10.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """flip → rotate → ToTensor → normalize; input uint8-valued [B,S,S,3]."""
    k_flip, k_rot = jax.random.split(key)
    x = random_flip(images_u8, k_flip)
    x = random_rotate_nearest(x, k_rot, rotate_degrees)
    return normalize_imagenet(x.astype(jnp.float32) / 255.0, dtype=dtype)


def eval_preprocess(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Eval chain: ToTensor → normalize (resize happens upstream)."""
    return normalize_imagenet(images_u8.astype(jnp.float32) / 255.0, dtype=dtype)


def weak_augment(images_u8: jnp.ndarray, key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
    """FixMatch 'weak' view: horizontal flip only → normalize."""
    x = random_flip(images_u8, key)
    return normalize_imagenet(x.astype(jnp.float32) / 255.0, dtype=dtype)


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
    return normalize_imagenet(x / 255.0, dtype=dtype)

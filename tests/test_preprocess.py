"""Preprocessing parity: device resize/normalize vs PIL/torchvision oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from ssip_tpu.ops.resize import (
    center_crop_bounds,
    extraction_preprocess,
    normalize_imagenet,
    resize_bilinear,
    training_resize,
    triangle_weights,
)


def _pil_resize(arr_u8: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    return np.asarray(Image.fromarray(arr_u8).resize((out_w, out_h), Image.BILINEAR))


class TestResize:
    def test_weights_rows_normalized(self):
        for src, dst in [(512, 256), (512, 224), (100, 224)]:
            w = triangle_weights(src, dst)
            np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)

    def test_512_to_256_bitwise_vs_pil(self, rng):
        img = rng.integers(0, 256, (512, 512, 3), np.uint8)
        ref = _pil_resize(img, 256, 256)
        got = np.asarray(resize_bilinear(jnp.asarray(img[None]), 256, 256))[0]
        np.testing.assert_array_equal(got.astype(np.uint8), ref)

    def test_512_to_224_within_1lsb(self, rng):
        img = rng.integers(0, 256, (512, 512, 3), np.uint8)
        ref = _pil_resize(img, 224, 224).astype(np.int32)
        got = np.asarray(training_resize(jnp.asarray(img[None]), 224))[0].astype(np.int32)
        diff = np.abs(got - ref)
        assert diff.max() <= 1
        assert (diff > 0).mean() < 0.02

    def test_nonsquare_resize(self, rng):
        img = rng.integers(0, 256, (128, 256, 3), np.uint8)
        ref = _pil_resize(img, 96, 64)
        got = np.asarray(resize_bilinear(jnp.asarray(img[None]), 64, 96))[0]
        assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1


class TestExtractionChain:
    def test_matches_pil_chain_bitwise(self, rng):
        """Full chain vs PIL: resize 256 → center crop 224 → /255 → normalize."""
        img = rng.integers(0, 256, (512, 512, 3), np.uint8)
        resized = _pil_resize(img, 256, 256)
        s = center_crop_bounds(256, 224)
        cropped = resized[s, s].astype(np.float32) / 255.0
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        ref = (cropped - mean) / std

        got = np.asarray(extraction_preprocess(jnp.asarray(img[None])))[0]
        np.testing.assert_allclose(got, ref, atol=1e-6)

    def test_crop_fusion_equivalence(self, rng):
        """Pre-sliced weight matrices == resize-then-crop."""
        img = rng.integers(0, 256, (512, 512, 3), np.uint8)
        full = np.asarray(resize_bilinear(jnp.asarray(img[None]), 256, 256))[0]
        s = center_crop_bounds(256, 224)
        fused = np.asarray(
            resize_bilinear(jnp.asarray(img[None]), 256, 256, row_slice=s, col_slice=s)
        )[0]
        np.testing.assert_array_equal(fused, full[s, s])

    def test_rectangular_input_short_side(self, rng):
        img = rng.integers(0, 256, (512, 640, 3), np.uint8)
        out = np.asarray(extraction_preprocess(jnp.asarray(img[None])))
        assert out.shape == (1, 224, 224, 3)

    def test_fractional_aspect_long_side_truncates(self, rng):
        """torchvision Resize(256) on 427×640 → 256×383 (int-truncated long
        side, NOT round()'s 384) — a round() grid shifts every output pixel
        (ADVICE r2). Oracle: PIL resize at the torchvision-computed size."""
        img = rng.integers(0, 256, (427, 640, 3), np.uint8)
        th, tw = 256, int(256 * 640 / 427)  # 383
        assert tw == 383 and round(256 * 640 / 427) == 384  # fractional case
        resized = _pil_resize(img, tw, th)
        rs, cs = center_crop_bounds(th, 224), center_crop_bounds(tw, 224)
        ref = resized[rs, cs].astype(np.float32) / 255.0
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        ref = (ref - mean) / std

        got = np.asarray(extraction_preprocess(jnp.asarray(img[None])))[0]
        # non-integer scale → PIL's fixed-point coefficients differ from
        # f32 weights by ≤1 LSB pre-normalize (≈0.0175 post) on few pixels;
        # a 1-px grid shift would blow far past this
        assert np.abs(got - ref).max() <= 1.01 / 255.0 / std.min()
        assert (np.abs(got - ref) > 1e-6).mean() < 0.05


class TestPallasKernel:
    def test_interpret_mode_matches_xla(self, rng):
        """Pallas kernel (interpret mode on CPU) == XLA reference path."""
        imgs = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
        out = _pallas_interpret(imgs, resize=32, crop=24)
        ref = np.asarray(
            extraction_preprocess(jnp.asarray(imgs), resize=32, crop=24)
        )
        np.testing.assert_allclose(out, ref, atol=1e-5)


def _pallas_interpret(imgs, resize, crop):
    """Run the pallas kernel body in interpret mode (CPU-safe)."""
    from functools import partial

    import jax
    from jax.experimental import pallas as pl

    from ssip_tpu.ops.pallas_preproc import _preproc_kernel
    from ssip_tpu.ops.resize import center_crop_bounds, triangle_weights

    b, h, w, _ = imgs.shape
    wv = triangle_weights(h, resize)[center_crop_bounds(resize, crop)]
    wht = triangle_weights(w, resize)[center_crop_bounds(resize, crop)].T
    x = jnp.transpose(jnp.asarray(imgs), (0, 3, 1, 2))
    out = pl.pallas_call(
        partial(_preproc_kernel, out_dtype=jnp.float32),
        out_shape=jax.ShapeDtypeStruct((b, 3, crop, crop), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((crop, h), lambda i: (0, 0)),
            pl.BlockSpec((w, crop), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, crop, crop), lambda i: (i, 0, 0, 0)),
        interpret=True,
    )(x, jnp.asarray(wv), jnp.asarray(wht))
    return np.transpose(np.asarray(out), (0, 2, 3, 1))


class TestAugment:
    def test_flip_deterministic_per_key(self, rng):
        import jax

        from ssip_tpu.ops.augment import random_flip

        imgs = jnp.asarray(rng.integers(0, 256, (8, 16, 16, 3), np.uint8))
        key = jax.random.key(0)
        a = random_flip(imgs, key)
        b = random_flip(imgs, key)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # roughly half flipped across many images
        flips = [
            not np.array_equal(np.asarray(a[i]), np.asarray(imgs[i])) for i in range(8)
        ]
        assert 0 < sum(flips) < 8

    def test_rotation_zero_angle_identity(self, rng):
        import jax

        from ssip_tpu.ops.augment import random_rotate_nearest

        imgs = jnp.asarray(rng.integers(0, 256, (2, 16, 16, 3), np.uint8))
        out = random_rotate_nearest(imgs, jax.random.key(0), max_degrees=0.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))

    def test_rotation_matches_pil_nearest(self, rng):
        """Fixed-angle rotation vs PIL Image.rotate(angle, NEAREST)."""
        import jax

        from ssip_tpu.ops.augment import random_rotate_nearest

        img = rng.integers(0, 256, (32, 32, 3), np.uint8)
        # find the angle our PRNG draws, then compare against PIL at that angle
        key = jax.random.key(3)
        angles = jax.random.uniform(key, (1,), minval=-10.0, maxval=10.0)
        angle = float(angles[0])
        got = np.asarray(
            random_rotate_nearest(jnp.asarray(img[None]), key, max_degrees=10.0)
        )[0]
        # PIL rotates counter-clockwise for positive angles; our inverse-map
        # convention matches torchvision's F.rotate (also CCW).
        ref = np.asarray(
            Image.fromarray(img).rotate(angle, resample=Image.NEAREST, fillcolor=(0, 0, 0))
        )
        np.testing.assert_array_equal(got.astype(np.uint8), ref)

    def test_normalize_values(self):
        x = jnp.ones((1, 2, 2, 3), jnp.float32)
        out = np.asarray(normalize_imagenet(x))
        np.testing.assert_allclose(
            out[0, 0, 0],
            (1 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225]),
            rtol=1e-5,
        )

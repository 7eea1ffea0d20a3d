"""MXU rotation kernel ≡ gather rotation, bit-exactly.

The TPU train path applies the NN-rotation index map via one-hot matmuls
(``ssip_tpu.ops.augment._rotate_mxu``); CPU/GPU use the flat-take gather.
Per the project invariant, the Pallas kernel is validated against the XLA
path in interpret mode on the CPU mesh — exact equality, not tolerance:
one-hot dots of uint8 values are exact in bf16.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ssip_tpu.ops.augment import (
    _mxu_geometry,
    _mxu_geometry_blocked,
    _rotate_gather,
    _rotate_mxu,
    _rotate_mxu_blocked,
    _rotation_index_map,
    _use_mxu_rotation,
)


def _angles(key, b, max_degrees):
    return jax.random.uniform(
        key, (b,), minval=-max_degrees, maxval=max_degrees
    ) * (jnp.pi / 180.0)


@pytest.mark.parametrize("rotate", [_rotate_mxu, _rotate_mxu_blocked])
@pytest.mark.parametrize(
    "shape,max_degrees",
    [
        ((2, 64, 96, 3), 10.0),
        ((3, 64, 64, 3), 25.0),
        ((2, 224, 224, 3), 10.0),
        ((1, 32, 128, 3), 2.0),
    ],
)
def test_mxu_matches_gather_bitwise(shape, max_degrees, rotate):
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.integers(0, 256, shape, np.uint8))
    for seed in (0, 1, 2):
        angles = _angles(jax.random.PRNGKey(seed), shape[0], max_degrees)
        iy, ix, valid = _rotation_index_map(angles, shape[1], shape[2])
        ref = np.asarray(_rotate_gather(images, iy, ix, valid))
        got = np.asarray(
            rotate(images, iy, ix, valid, max_degrees, interpret=True)
        )
        np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("rotate", [_rotate_mxu, _rotate_mxu_blocked])
def test_mxu_extreme_angles_stay_in_band(rotate):
    """Angles pinned at ±max_degrees — the worst case for the band margins."""
    shape = (2, 64, 96, 3)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.integers(0, 256, shape, np.uint8))
    for deg in (-25.0, 25.0, -10.0, 10.0):
        angles = jnp.full((shape[0],), deg * np.pi / 180.0)
        iy, ix, valid = _rotation_index_map(angles, shape[1], shape[2])
        ref = np.asarray(_rotate_gather(images, iy, ix, valid))
        got = np.asarray(
            rotate(images, iy, ix, valid, abs(deg), interpret=True)
        )
        np.testing.assert_array_equal(got, ref)


def test_geometry_margins():
    yb, pt, r, hp = _mxu_geometry(224, 224, 10.0)
    assert yb == 16 and r % 8 == 0
    # band must cover the in-cell span with slack, and stay modest
    assert 56 <= r <= 80
    assert hp >= 224 + 2 * pt + r


def test_geometry_blocked_margins():
    g = _mxu_geometry_blocked(224, 224, 10.0)
    assert g is not None
    yb, xb, pt, px, r2, cb, hp, wp = g
    assert yb == 16 and 224 % xb == 0 and xb < 224
    assert (yb * xb) % 128 == 0  # lane dim stays 128-aligned
    assert r2 % 8 == 0 and cb % 8 == 0 and cb <= 128  # one MXU K pass
    assert hp >= 224 + 2 * pt + r2 and wp >= 224 + 2 * px + cb
    # 2-D banding must beat the row band on contraction size: K and M
    yb1, _, r1, _ = _mxu_geometry(224, 224, 10.0)
    assert cb < 224 and r2 <= r1
    # widths with no 128-aligned divisor fall back to the row-banded kernel
    assert _mxu_geometry_blocked(64, 36, 10.0) is None


def test_gate_rejects_unsupported():
    imgs_f32 = jnp.zeros((2, 224, 224, 3), jnp.float32)
    assert not _use_mxu_rotation(imgs_f32, 10.0)  # non-uint8
    imgs_u8 = jnp.zeros((2, 224, 224, 3), jnp.uint8)
    assert not _use_mxu_rotation(imgs_u8, 45.0)  # wide rotation
    odd = jnp.zeros((2, 225, 224, 3), jnp.uint8)
    assert not _use_mxu_rotation(odd, 10.0)  # rows not divisible
    # CPU test mesh -> public path must take the gather (platform gate)
    assert jax.default_backend() != "tpu"
    assert not _use_mxu_rotation(imgs_u8, 10.0)

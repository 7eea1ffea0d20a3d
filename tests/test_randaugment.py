"""RandAugment/Cutout: PIL oracles per op + policy-level properties.

Each pixel op is asserted against the PIL primitive it reimplements
(ImageOps.autocontrast/equalize/posterize/solarize, ImageEnhance.*), the
geometric ops against exact shift semantics / torchvision agreement, and the
assembled policy for jit-ability, determinism, and FixMatch integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from ssip_tpu.ops import randaugment as ra


@pytest.fixture(scope="module")
def batch_u8():
    rng = np.random.default_rng(7)
    # mixed content: pure noise, low-contrast, structured gradient
    imgs = [
        rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
        (rng.integers(90, 140, (32, 32, 3))).astype(np.uint8),
        np.stack(
            list(np.meshgrid(np.arange(32) * 8 % 256, np.arange(32) * 5 % 256))
            + [np.full((32, 32), 60)],
            axis=-1,
        ).astype(np.uint8),
        rng.integers(0, 50, (32, 32, 3), dtype=np.uint8),
    ]
    return np.stack(imgs)


def _f(x):
    return jnp.asarray(x, jnp.float32)


# ---------------------------------------------------------------------------
# pixel-op oracles
# ---------------------------------------------------------------------------


def test_autocontrast_matches_pil(batch_u8):
    ours = np.asarray(ra._op_autocontrast(_f(batch_u8))).astype(np.int32)
    for i, img in enumerate(batch_u8):
        pil = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
        diff = np.abs(ours[i] - pil.astype(np.int32))
        assert diff.max() <= 1, f"image {i}: max diff {diff.max()}"


def test_equalize_matches_pil(batch_u8):
    ours = np.asarray(ra._op_equalize(_f(batch_u8))).astype(np.uint8)
    for i, img in enumerate(batch_u8):
        pil = np.asarray(ImageOps.equalize(Image.fromarray(img)))
        np.testing.assert_array_equal(ours[i], pil)


def test_posterize_matches_pil(batch_u8):
    # mag -> drop bits: 0 -> 8 bits kept ... 1 -> 4 bits kept
    for mag, bits in ((0.0, 8), (0.25, 7), (0.5, 6), (0.75, 5), (1.0, 4)):
        m = jnp.full((batch_u8.shape[0],), mag)
        ours = np.asarray(ra._op_posterize(_f(batch_u8), m)).astype(np.uint8)
        for i, img in enumerate(batch_u8):
            pil = np.asarray(ImageOps.posterize(Image.fromarray(img), bits))
            np.testing.assert_array_equal(ours[i], pil)


def test_solarize_matches_pil(batch_u8):
    for mag in (0.25, 0.5, 0.9):
        thresh = int(round(256 * (1 - mag)))
        m = jnp.full((batch_u8.shape[0],), mag)
        ours = np.asarray(ra._op_solarize(_f(batch_u8), m)).astype(np.uint8)
        for i, img in enumerate(batch_u8):
            pil = np.asarray(ImageOps.solarize(Image.fromarray(img), thresh))
            np.testing.assert_array_equal(ours[i], pil)


def test_solarize_mag_zero_is_identity(batch_u8):
    m = jnp.zeros((batch_u8.shape[0],))
    ours = np.asarray(ra._op_solarize(_f(batch_u8), m)).astype(np.uint8)
    np.testing.assert_array_equal(ours, batch_u8)


@pytest.mark.parametrize("factor", [0.1, 0.7, 1.0, 1.5, 1.9])
@pytest.mark.parametrize(
    "op,enhancer",
    [
        (ra._op_brightness, ImageEnhance.Brightness),
        (ra._op_color, ImageEnhance.Color),
        (ra._op_contrast, ImageEnhance.Contrast),
        (ra._op_sharpness, ImageEnhance.Sharpness),
    ],
)
def test_enhance_ops_match_pil(batch_u8, op, enhancer, factor):
    f = jnp.full((batch_u8.shape[0],), factor)
    ours = np.asarray(op(_f(batch_u8), f)).astype(np.int32)
    for i, img in enumerate(batch_u8):
        pil = np.asarray(enhancer(Image.fromarray(img)).enhance(factor))
        diff = np.abs(ours[i] - pil.astype(np.int32))
        assert diff.max() <= 1, f"image {i}: max diff {diff.max()}"


def test_enhance_factor_one_is_identity(batch_u8):
    one = jnp.ones((batch_u8.shape[0],))
    for op in (ra._op_brightness, ra._op_color, ra._op_contrast,
               ra._op_sharpness):
        out = np.asarray(op(_f(batch_u8), one)).astype(np.uint8)
        np.testing.assert_array_equal(out, batch_u8)


# ---------------------------------------------------------------------------
# geometric ops
# ---------------------------------------------------------------------------


def _warp_single_op(batch, op_idx, mag, sign):
    b, h, w, _ = batch.shape
    op = jnp.full((b,), op_idx)
    m = jnp.full((b,), mag)
    s = jnp.full((b,), sign)
    params = ra._geo_params(op, m, s, h, w)
    return np.asarray(ra._affine_nearest(_f(batch), *params))


def test_translate_exact_shift(batch_u8):
    # op 3 = translate_x, full magnitude -> round(0.3 * 32) = 10 px right
    out = _warp_single_op(batch_u8, 3, 1.0, 1.0)
    expect = np.zeros_like(batch_u8, dtype=np.float32)
    expect[:, :, 10:, :] = batch_u8[:, :, :-10, :]
    np.testing.assert_array_equal(out, expect)
    # op 4 = translate_y, negative sign -> content moves up
    out = _warp_single_op(batch_u8, 4, 1.0, -1.0)
    expect = np.zeros_like(batch_u8, dtype=np.float32)
    expect[:, :-10, :, :] = batch_u8[:, 10:, :, :]
    np.testing.assert_array_equal(out, expect)


def test_identity_params_are_exact(batch_u8):
    # a pixel-op image (g_op = -1) must pass the warp untouched
    out = _warp_single_op(batch_u8, -1, 0.73, 1.0)
    np.testing.assert_array_equal(out, batch_u8.astype(np.float32))


def test_rotate_matches_augment_rotation(batch_u8):
    # the pool's rotate must agree with ops.augment's NN rotation machinery
    from ssip_tpu.ops.augment import _rotation_index_map, _rotate_gather

    b, h, w, _ = batch_u8.shape
    angle = 0.42 * ra.MAX_ROTATE_DEG * np.pi / 180.0
    out = _warp_single_op(batch_u8, 0, 0.42, 1.0)
    iy, ix, valid = _rotation_index_map(jnp.full((b,), angle), h, w)
    expect = np.asarray(_rotate_gather(_f(batch_u8), iy, ix, valid))
    np.testing.assert_array_equal(out, expect)


@pytest.mark.parametrize("op_idx", [1, 2, 3, 4])
def test_geometry_agrees_with_pil_affine(batch_u8, op_idx):
    """Shear/translate vs PIL Image.transform(AFFINE, NEAREST) with the same
    center-based inverse map. PIL samples source coords at output pixel
    centers (x+.5) and truncates, vs our floor(src+.5) at integer coords —
    conventions differ only at NN region boundaries, so the contract is bulk
    agreement."""
    b, h, w, _ = batch_u8.shape
    mag, sign = 1.0, 1.0
    out = _warp_single_op(batch_u8, op_idx, mag, sign).astype(np.uint8)
    params = ra._geo_params(
        jnp.full((b,), op_idx), jnp.full((b,), mag), jnp.full((b,), sign), h, w
    )
    m00, m01, m10, m11, oy, ox = (float(np.asarray(p)[0]) for p in params)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    # PIL matrix (a,b,c,d,e,f): src_x = a x + b y + c, evaluated at output
    # pixel centers (x+.5, y+.5) then truncated. Folding a (0.5 - (a+b)/2)
    # correction into each constant makes PIL compute floor(src + 0.5) at
    # integer coords — our exact convention — so agreement is near-exact
    # (only fixed-point 2^-16 quantization at exact .5 boundaries remains).
    c0 = cx + ox - m11 * cx - m10 * cy + 0.5 - (m11 + m10) / 2.0
    f0 = cy + oy - m01 * cx - m00 * cy + 0.5 - (m01 + m00) / 2.0
    pil_matrix = (m11, m10, c0, m01, m00, f0)
    agree = []
    for i, img in enumerate(batch_u8):
        pil = Image.fromarray(img).transform(
            (w, h), Image.AFFINE, pil_matrix, resample=Image.NEAREST,
            fillcolor=(0, 0, 0),
        )
        agree.append(np.mean(out[i] == np.asarray(pil)))
    assert float(np.mean(agree)) > 0.99, agree


# ---------------------------------------------------------------------------
# policy level
# ---------------------------------------------------------------------------


def test_randaugment_jits_and_is_deterministic(batch_u8):
    key = jax.random.PRNGKey(3)
    fn = jax.jit(lambda x, k: ra.randaugment(x, k, num_layers=2))
    out1 = np.asarray(fn(jnp.asarray(batch_u8), key))
    out2 = np.asarray(fn(jnp.asarray(batch_u8), key))
    assert out1.dtype == np.uint8 and out1.shape == batch_u8.shape
    np.testing.assert_array_equal(out1, out2)
    out3 = np.asarray(fn(jnp.asarray(batch_u8), jax.random.PRNGKey(4)))
    assert not np.array_equal(out1, out3)


def test_randaugment_changes_most_images(batch_u8):
    # with 2 layers, P(identity twice) = (1/14)^2 — across keys nearly every
    # image should change
    key = jax.random.PRNGKey(0)
    out = np.asarray(ra.randaugment(jnp.asarray(batch_u8), key))
    changed = [not np.array_equal(out[i], batch_u8[i]) for i in range(len(out))]
    assert sum(changed) >= len(out) - 1


def test_cutout_properties(batch_u8):
    key = jax.random.PRNGKey(11)
    out = np.asarray(ra.cutout(jnp.asarray(batch_u8), key, fraction=0.5))
    assert out.dtype == np.uint8
    for i in range(len(out)):
        diff = out[i] != batch_u8[i]
        n_diff = np.any(diff, axis=-1).sum()
        side = 16  # 0.5 * 32
        assert n_diff <= side * side
        # every altered pixel is the fill value
        assert np.all(out[i][np.any(diff, axis=-1)] == 127)


def test_strong_augment_randaugment_normalized_output(batch_u8):
    from ssip_tpu.ops.randaugment import strong_augment_randaugment

    out = strong_augment_randaugment(jnp.asarray(batch_u8), jax.random.PRNGKey(5))
    assert out.dtype == jnp.float32
    assert out.shape == batch_u8.shape
    # ImageNet-normalized range
    assert float(jnp.min(out)) >= -3.0 and float(jnp.max(out)) <= 3.0


def test_fixmatch_epoch_with_randaugment():
    """One FixMatch step with the RandAugment strong view: finite loss,
    param movement, and the epoch jit compiles with scan."""
    from ssip_tpu.models import ResNet18
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.train.consistency import make_fixmatch_epoch
    from ssip_tpu.train.engine import TrainState, make_optimizer

    model = ResNet18(num_classes=2)
    variables = seeded_init_host(model, 0, (1, 32, 32, 3))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=make_optimizer(1e-4, 1e-4),
    )
    rng = np.random.default_rng(0)
    s, b, u = 2, 4, 4
    images = jnp.asarray(rng.integers(0, 256, (s, b, 32, 32, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 2, (s, b)))
    valid = jnp.ones((s, b), dtype=bool)
    unl = jnp.asarray(rng.integers(0, 256, (s, u, 32, 32, 3), dtype=np.uint8))
    keys = jax.random.split(jax.random.PRNGKey(0), s)

    epoch = make_fixmatch_epoch(1.0, 0.0, strong_aug="randaugment")
    new_state, losses, sup, cons, keep, preds = epoch(
        state, images, labels, valid, unl, keys
    )
    assert np.all(np.isfinite(np.asarray(losses)))
    assert float(jnp.mean(keep)) > 0.0  # threshold 0 keeps everything
    moved = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, new_state.params
    )
    assert max(jax.tree.leaves(moved)) > 0.0


def test_make_fixmatch_epoch_rejects_unknown_aug():
    from ssip_tpu.train.consistency import make_fixmatch_epoch

    with pytest.raises(ValueError):
        make_fixmatch_epoch(1.0, 0.5, strong_aug="wat")

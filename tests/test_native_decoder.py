"""Native libjpeg decoder vs PIL oracle (skipped if the .so isn't built)."""

import numpy as np
import pytest
from PIL import Image

from ssip_tpu.native import decoder

pytestmark = pytest.mark.skipif(
    not decoder.available(), reason="native decoder not built"
)


def test_bitwise_matches_pil(tiny_image_tree):
    files = sorted((tiny_image_tree / "sans_label").glob("*.jpg"))
    for f in files[:4]:
        ours = decoder.decode_one(f)
        ref = np.asarray(Image.open(f))
        np.testing.assert_array_equal(ours, ref)


def test_batch_and_corrupt_tolerance(tiny_image_tree):
    bad = tiny_image_tree / "sans_label" / "corrupt.jpg"
    bad.write_bytes(b"not a jpeg at all")
    files = sorted((tiny_image_tree / "sans_label").glob("*.jpg"))
    out = decoder.decode_batch(files, num_threads=2)
    assert sum(o is None for o in out) == 1
    assert out[files.index(bad)] is None


def test_scaled_decode_halves(tiny_image_tree):
    f = sorted((tiny_image_tree / "sans_label").glob("*.jpg"))[0]
    arr = decoder.decode_one(f, fast_scale=32)
    assert arr.shape == (32, 32, 3)  # 64² source, denom 2


def test_non_jpeg_rejected(tmp_path):
    png = tmp_path / "x.png"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(png)
    assert decoder.decode_one(png) is None  # caller falls back to PIL


def test_integration_through_decode_batch(tiny_image_tree):
    from ssip_tpu.data.decode import decode_batch

    files = sorted((tiny_image_tree / "sans_label").glob("*.jpg"))
    arrays, failures = decode_batch(files, use_native=True)
    ref_arrays, _ = decode_batch(files, use_native=False)
    assert not failures
    for a, b in zip(arrays, ref_arrays):
        np.testing.assert_array_equal(a, b)


def test_resize_crop_matches_pil_oracle(rng):
    """Native fused triangle-filter resize+crop is BITWISE the PIL chain
    with torchvision size semantics (int-truncated long side) on every
    shape — it reimplements Pillow's 8bpc fixed-point resample exactly
    (PRECISION_BITS coefficients, integer accumulation, clip8)."""
    for h, w in [(512, 512), (384, 512), (427, 640), (96, 64), (256, 256),
                 (300, 301)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = decoder.resize_crop(img, 256, 224)
        assert got is not None and got.shape == (224, 224, 3)
        if h <= w:
            th, tw = 256, max(1, int(w * 256 / h))
        else:
            th, tw = max(1, int(h * 256 / w)), 256
        ref = img if (h, w) == (th, tw) else np.asarray(
            Image.fromarray(img).resize((tw, th), Image.BILINEAR)
        )
        top = int(round((th - 224) / 2.0))
        left = int(round((tw - 224) / 2.0))
        ref = ref[top : top + 224, left : left + 224]
        np.testing.assert_array_equal(got, ref, err_msg=f"{h}x{w}")


def test_resize_crop_matches_device_chain(rng):
    """Native host preprocessing == the device chain's resample grid
    (ops/resize.py resize_bilinear with fused crop slices), uint8-exact
    within 1 LSB — the --host-preproc 'no numerics change' claim."""
    import jax.numpy as jnp

    from ssip_tpu.ops.resize import center_crop_bounds, resize_bilinear

    img = rng.integers(0, 256, (512, 512, 3), dtype=np.uint8)
    got = decoder.resize_crop(img, 256, 224)
    s = center_crop_bounds(256, 224)
    dev = np.asarray(
        resize_bilinear(jnp.asarray(img[None]), 256, 256, row_slice=s, col_slice=s)
    )[0].astype(np.uint8)
    np.testing.assert_array_equal(got, dev)


def test_decode_batch_fused_host_preproc(tiny_image_tree):
    """decode_batch(host_resize, host_crop) returns crop-shaped rows that
    equal decode-then-preprocess_host_exact, native and PIL paths agreeing."""
    from ssip_tpu.data.decode import decode_batch, preprocess_host_exact

    files = sorted((tiny_image_tree / "sans_label").glob("*.jpg"))[:4]
    fused, fails = decode_batch(files, num_threads=2, host_resize=48, host_crop=32)
    assert not fails
    assert all(a.shape == (32, 32, 3) for a in fused)
    pil, _ = decode_batch(
        files, num_threads=2, host_resize=48, host_crop=32, use_native=False
    )
    for a, b in zip(fused, pil):
        np.testing.assert_array_equal(a, b)  # native ≡ PIL bitwise
    raw, _ = decode_batch(files, num_threads=2)
    for a, r in zip(fused, raw):
        np.testing.assert_array_equal(a, preprocess_host_exact(r, 48, 32))

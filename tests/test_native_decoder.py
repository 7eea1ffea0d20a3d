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

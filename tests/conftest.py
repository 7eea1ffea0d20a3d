"""Test bootstrap: force an 8-device virtual CPU mesh before JAX imports.

This is the JAX-native fake backend for exercising mesh/pjit/collective logic
without TPU hardware (SURVEY.md §4c).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be in sys.modules (platform plugins import it at interpreter
# startup), in which case JAX_PLATFORMS was captured before we could set it —
# override through the live config instead. Backends must not be initialized
# yet, which holds because nothing calls jax.devices() before tests run.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def tiny_image_tree(tmp_path_factory):
    """Synthetic dataset tree mirroring the reference layout:

    avec_labels/{cancer,normal}/*.jpg + sans_label/*.jpg, 64x64 RGB JPEGs.
    """
    from PIL import Image

    root = tmp_path_factory.mktemp("dataset")
    gen = np.random.default_rng(0)
    for bucket, count in (("cancer", 6), ("normal", 6)):
        d = root / "avec_labels" / bucket
        d.mkdir(parents=True)
        for i in range(count):
            arr = gen.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{bucket}_{i:02d}.jpg")
    u = root / "sans_label"
    u.mkdir()
    for i in range(10):
        arr = gen.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(u / f"unlabeled_{i:02d}.jpg")
    return root

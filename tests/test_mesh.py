"""Mesh/sharding tests on the virtual 8-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssip_tpu.parallel import (
    MeshSpec,
    batch_sharding,
    build_mesh,
    pad_to_multiple,
    shard_batch,
)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_default_mesh_pure_dp():
    mesh = build_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_2d_mesh():
    mesh = build_mesh(MeshSpec(data=4, model=2))
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_mesh_too_large_raises():
    with pytest.raises(ValueError):
        build_mesh(MeshSpec(data=16, model=2))


def test_pad_to_multiple():
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(9, 8) == 16


def test_shard_batch_pads_and_shards():
    mesh = build_mesh()
    x = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    sharded, n = shard_batch(mesh, x)
    assert n == 5
    assert sharded.shape == (8, 3)
    assert sharded.sharding == batch_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded)[:5], x)
    np.testing.assert_array_equal(np.asarray(sharded)[5:], 0)


def test_jit_reduction_over_sharded_batch():
    """A global mean over a data-sharded array is a cross-device reduction."""
    mesh = build_mesh()
    x = np.ones((16, 4), dtype=np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda a: jnp.mean(a))(xs)
    assert float(out) == pytest.approx(1.0)

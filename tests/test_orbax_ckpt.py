"""Sharded orbax snapshot backend: round-trip, sharding restore, dispatch.

SURVEY §5.4's plan row calls for "orbax-style checkpoint of Flax params +
optimizer state". The msgpack backend covers the single-host contract;
``SSIP_SNAPSHOT_FORMAT=orbax`` (ssip_tpu/train/orbax_ckpt.py) is the
multi-host-shaped variant: per-shard writes, restore directly into the
template's shardings. These tests run it on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssip_tpu.models import ResNet18
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.parallel.mesh import MeshSpec, build_mesh
from ssip_tpu.train.checkpoints import load_train_snapshot, save_train_snapshot
from ssip_tpu.train.engine import (
    DeviceDataset,
    TrainState,
    _place_tree,
    make_optimizer,
    train_model,
)
from ssip_tpu.train.orbax_ckpt import (
    load_train_snapshot_orbax,
    save_train_snapshot_orbax,
)

IMG = 32


def _state():
    model = ResNet18(num_classes=2)
    v = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    return TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats=v["batch_stats"],
        tx=make_optimizer(1e-3, 1e-4),
    )


DRIVER = {
    "epoch": 3,
    "history": {"train_loss": [1.0, 0.5]},
    "best_val_loss": 0.4,
    "early_patience": 1,
    "plateau_best": 0.4,
    "plateau_bad": 0,
    "finished": False,
}


def _assert_states_equal(a, b):
    flat_a, _ = jax.tree_util.tree_flatten(
        {"params": a.params, "batch_stats": a.batch_stats,
         "opt_state": a.opt_state, "step": a.step}
    )
    flat_b, _ = jax.tree_util.tree_flatten(
        {"params": b.params, "batch_stats": b.batch_stats,
         "opt_state": b.opt_state, "step": b.step}
    )
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_unsharded(tmp_path):
    state = _state()
    snap = tmp_path / "snap_orbax"
    save_train_snapshot_orbax(snap, state, DRIVER)
    assert snap.is_dir()
    restored, driver = load_train_snapshot_orbax(snap, _state())
    assert driver == DRIVER
    _assert_states_equal(restored, state)


def test_roundtrip_sharded_mesh_restores_shardings(tmp_path):
    """Save a mesh-placed state, restore into a mesh-placed template: values
    equal and every leaf lands on the template's sharding (no single-host
    gather materialization)."""
    mesh = build_mesh(MeshSpec(data=4, model=2))
    state = _place_tree(mesh, _state())
    snap = tmp_path / "snap_mesh"
    save_train_snapshot_orbax(snap, state, DRIVER)

    template = _place_tree(mesh, _state())
    restored, driver = load_train_snapshot_orbax(snap, template)
    assert driver == DRIVER
    _assert_states_equal(restored, state)
    for got, want in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(template.params),
    ):
        assert got.sharding.is_equivalent_to(want.sharding, got.ndim)


def test_env_dispatch_and_autodetect(tmp_path, monkeypatch):
    """save_train_snapshot routes via SSIP_SNAPSHOT_FORMAT; load auto-detects
    a directory snapshot with the env var UNSET (format switches between
    runs must not orphan a resume point)."""
    state = _state()
    snap = tmp_path / "snap_dispatch"
    monkeypatch.setenv("SSIP_SNAPSHOT_FORMAT", "orbax")
    save_train_snapshot(snap, state, DRIVER)
    assert snap.is_dir()
    monkeypatch.delenv("SSIP_SNAPSHOT_FORMAT")
    restored, driver = load_train_snapshot(snap, _state())
    assert driver == DRIVER
    _assert_states_equal(restored, state)


def test_interrupted_training_resumes_through_orbax(tmp_path, monkeypatch):
    """The engine's resume path, end to end, with the orbax backend on a
    data-parallel mesh — the interrupted run continues to the uninterrupted
    run's trajectory (same bar as the msgpack resume test)."""
    monkeypatch.setenv("SSIP_SNAPSHOT_FORMAT", "orbax")
    rng = np.random.default_rng(0)
    n = 16
    labels = np.r_[np.zeros(n // 2, np.int64), np.ones(n // 2, np.int64)]
    imgs = np.where(
        labels[:, None, None, None] == 1,
        rng.integers(160, 255, (n, IMG, IMG, 3)),
        rng.integers(0, 96, (n, IMG, IMG, 3)),
    ).astype(np.uint8)
    data = DeviceDataset.create(jnp.asarray(imgs), labels)
    mesh = build_mesh(MeshSpec(data=4, model=1))
    common = dict(
        batch_size=8, seed=42, stream_name="orbax_resume", balanced=True,
        augment=False, early_stopping_patience=10, mesh=mesh,
    )

    full_state, full_history = train_model(
        _state(), data, data, num_epochs=3, **common
    )

    snap = tmp_path / "orbax_resume_snap"
    train_model(_state(), data, data, num_epochs=1, resume_path=snap, **common)
    assert snap.is_dir()
    resumed_state, resumed_history = train_model(
        _state(), data, data, num_epochs=3, resume_path=snap, **common
    )
    assert len(resumed_history["train_loss"]) == 3
    np.testing.assert_allclose(
        resumed_history["train_loss"], full_history["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(resumed_state.params["fc"]["kernel"]),
        np.asarray(full_state.params["fc"]["kernel"]),
        rtol=1e-6, atol=1e-7,
    )

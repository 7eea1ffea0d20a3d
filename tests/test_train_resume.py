"""Mid-run training resume: interrupted run continues to identical results."""

import jax.numpy as jnp
import numpy as np

from ssip_tpu.models import ResNet18
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.train.engine import DeviceDataset, TrainState, make_optimizer, train_model

IMG = 32


def _state():
    model = ResNet18(num_classes=2)
    v = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    return TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats=v["batch_stats"],
        tx=make_optimizer(1e-3, 1e-4),
    )


def _data():
    rng = np.random.default_rng(0)
    n = 16
    labels = np.r_[np.zeros(n // 2, np.int64), np.ones(n // 2, np.int64)]
    imgs = np.where(
        labels[:, None, None, None] == 1,
        rng.integers(160, 255, (n, IMG, IMG, 3)),
        rng.integers(0, 96, (n, IMG, IMG, 3)),
    ).astype(np.uint8)
    return DeviceDataset.create(jnp.asarray(imgs), labels)


COMMON = dict(
    batch_size=8, seed=42, stream_name="resume_test", balanced=True,
    augment=False, early_stopping_patience=10,
)


def test_interrupt_and_resume_matches_uninterrupted(tmp_path):
    data = _data()

    # uninterrupted 4-epoch run
    full_state, full_history = train_model(
        _state(), data, data, num_epochs=4, **COMMON
    )

    # interrupted: 2 epochs with snapshots, then resume to 4
    snap = tmp_path / "resume_test.msgpack"
    train_model(_state(), data, data, num_epochs=2, resume_path=snap, **COMMON)
    assert snap.exists()  # single self-contained snapshot file

    resumed_state, resumed_history = train_model(
        _state(), data, data, num_epochs=4, resume_path=snap, **COMMON
    )
    assert len(resumed_history["train_loss"]) == 4
    np.testing.assert_allclose(
        resumed_history["train_loss"], full_history["train_loss"], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(resumed_state.params["fc"]["kernel"]),
        np.asarray(full_state.params["fc"]["kernel"]),
        rtol=1e-6, atol=1e-7,
    )


def test_finished_snapshot_short_circuits(tmp_path):
    data = _data()
    snap = tmp_path / "s.msgpack"
    state1, hist1 = train_model(
        _state(), data, data, num_epochs=2, resume_path=snap, **COMMON
    )
    # snapshot marked finished → re-invocation returns without training
    state2, hist2 = train_model(
        _state(), data, data, num_epochs=2, resume_path=snap, **COMMON
    )
    np.testing.assert_allclose(hist2["train_loss"], hist1["train_loss"])
    np.testing.assert_array_equal(
        np.asarray(state2.params["fc"]["kernel"]),
        np.asarray(state1.params["fc"]["kernel"]),
    )


def test_corrupt_snapshot_starts_fresh(tmp_path, caplog):
    """A truncated/garbage snapshot must not brick the run (ADVICE r1):
    train_model warns and trains from scratch."""
    data = _data()
    snap = tmp_path / "resume_test.msgpack"
    snap.write_bytes(b"SSIPSNAP1\n\x00\x00\x00\x00\x00\x00\x00\x10truncated")

    state, history = train_model(
        _state(), data, data, num_epochs=2, resume_path=snap, **COMMON
    )
    assert len(history["train_loss"]) == 2  # trained all epochs from scratch
    # and the bad snapshot was replaced by a good one
    from ssip_tpu.train.checkpoints import load_train_snapshot

    _, driver = load_train_snapshot(snap, _state())
    assert driver["epoch"] == 1


def test_snapshot_single_file_atomic(tmp_path):
    """Snapshots are one self-contained file (no .driver.json sidecar, no
    leftover .tmp) so a mid-write SIGKILL can never desync state vs driver."""
    from ssip_tpu.train.checkpoints import load_train_snapshot, save_train_snapshot

    state = _state()
    snap = tmp_path / "s.msgpack"
    save_train_snapshot(snap, state, {"epoch": 3, "history": {"train_loss": [1.0]}})
    assert snap.exists()
    assert not snap.with_suffix(snap.suffix + ".driver.json").exists()
    assert not list(tmp_path.glob("*.tmp"))

    restored, driver = load_train_snapshot(snap, _state())
    assert driver["epoch"] == 3
    np.testing.assert_array_equal(
        np.asarray(restored.params["conv1"]["kernel"]),
        np.asarray(state.params["conv1"]["kernel"]),
    )


def test_snapshot_legacy_two_file_layout_still_loads(tmp_path):
    """Snapshots written before the atomic single-file format restore."""
    import json

    import jax
    from flax import serialization

    from ssip_tpu.train.checkpoints import _state_tree, load_train_snapshot

    state = _state()
    snap = tmp_path / "legacy.msgpack"
    snap.write_bytes(serialization.to_bytes(jax.device_get(_state_tree(state))))
    snap.with_suffix(snap.suffix + ".driver.json").write_text(
        json.dumps({"epoch": 7})
    )
    _, driver = load_train_snapshot(snap, _state())
    assert driver["epoch"] == 7

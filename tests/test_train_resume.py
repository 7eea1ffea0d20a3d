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
    assert snap.exists() and snap.with_suffix(".msgpack.driver.json").exists()

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

"""Training-engine semantics: steps, freezing, plateau LR, early stop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssip_tpu.models import ResNet18
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.train.engine import (
    DeviceDataset,
    TrainState,
    get_lr,
    make_optimizer,
    make_train_step,
    run_eval_epoch,
    set_lr,
    train_model,
)

IMG = 32  # tiny spatial size keeps CPU tests fast


@pytest.fixture(scope="module")
def toy_state():
    model = ResNet18(num_classes=2)
    variables = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    tx = make_optimizer(1e-3, 1e-4)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )


@pytest.fixture(scope="module")
def toy_data():
    rng = np.random.default_rng(0)
    # separable classes: bright vs dark images
    n = 16
    labels = np.r_[np.zeros(n // 2, np.int64), np.ones(n // 2, np.int64)]
    imgs = np.where(
        labels[:, None, None, None] == 1,
        rng.integers(160, 255, (n, IMG, IMG, 3)),
        rng.integers(0, 96, (n, IMG, IMG, 3)),
    ).astype(np.uint8)
    return DeviceDataset.create(jnp.asarray(imgs), labels)


def test_train_step_updates_params_and_bn(toy_state, toy_data):
    step = make_train_step(augment=False)
    key = jax.random.key(0)
    new_state, loss, preds = step(
        toy_state,
        toy_data.images_u8[:8],
        toy_data.labels_dev[:8],
        jnp.ones(8, bool),
        key,
    )
    assert np.isfinite(float(loss))
    assert preds.shape == (8,)
    assert int(new_state.step) == int(toy_state.step) + 1
    # params changed
    a = toy_state.params["conv1"]["kernel"]
    b = new_state.params["conv1"]["kernel"]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # BN running stats changed
    assert not np.allclose(
        np.asarray(toy_state.batch_stats["bn1"]["mean"]),
        np.asarray(new_state.batch_stats["bn1"]["mean"]),
    )


def test_frozen_mask_keeps_backbone_bitwise(toy_state, toy_data):
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: str(path[0].key) == "fc", toy_state.params
    )
    step = make_train_step(augment=False, trainable_mask=mask)
    new_state, _, _ = step(
        toy_state,
        toy_data.images_u8[:8],
        toy_data.labels_dev[:8],
        jnp.ones(8, bool),
        jax.random.key(0),
    )
    np.testing.assert_array_equal(
        np.asarray(toy_state.params["conv1"]["kernel"]),
        np.asarray(new_state.params["conv1"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(toy_state.params["fc"]["kernel"]),
        np.asarray(new_state.params["fc"]["kernel"]),
    )
    # BN stats still update while frozen (torch train-mode semantics)
    assert not np.allclose(
        np.asarray(toy_state.batch_stats["bn1"]["mean"]),
        np.asarray(new_state.batch_stats["bn1"]["mean"]),
    )


def test_padding_rows_do_not_affect_loss(toy_state, toy_data):
    step = make_train_step(augment=False)
    # same 4 valid rows, padded to 8 with garbage — loss must match valid-only mean
    imgs = toy_data.images_u8[:8]
    labels = toy_data.labels_dev[:8]
    valid = jnp.asarray([True] * 4 + [False] * 4)
    _, loss_padded, _ = step(toy_state, imgs, labels, valid, jax.random.key(1))

    imgs4 = jnp.concatenate([toy_data.images_u8[:4]] * 2)
    labels4 = jnp.concatenate([toy_data.labels_dev[:4]] * 2)
    valid4 = jnp.asarray([True] * 4 + [False] * 4)
    _, loss_dup, _ = step(toy_state, imgs4, labels4, valid4, jax.random.key(1))
    # both compute the mean over the SAME 4 valid examples
    assert float(loss_padded) == pytest.approx(float(loss_dup), rel=1e-5)


def test_lr_get_set(toy_state):
    assert get_lr(toy_state) == pytest.approx(1e-3)
    s2 = set_lr(toy_state, 5e-4)
    assert get_lr(s2) == pytest.approx(5e-4)


def test_train_model_learns_and_history(toy_state, toy_data):
    state, history = train_model(
        toy_state,
        toy_data,
        toy_data,
        num_epochs=4,
        batch_size=8,
        seed=42,
        stream_name="test",
        balanced=True,
        augment=False,
        early_stopping_patience=10,
    )
    assert set(history) == {
        "train_loss", "val_loss", "train_acc", "val_acc", "train_f1", "val_f1"
    }
    assert len(history["train_loss"]) == 4
    # bright-vs-dark is trivially separable: loss must drop
    assert history["val_loss"][-1] < history["val_loss"][0]
    _, y_true, y_pred, probs = run_eval_epoch(state, toy_data, 8)
    assert probs.shape == (16, 2)
    assert (y_true == y_pred).mean() >= 0.9


def test_early_stopping_restores_best(toy_state, toy_data, monkeypatch):
    # Make validation loss increase after epoch 0 by shuffling labels of val:
    rng = np.random.default_rng(1)
    bad_val = DeviceDataset.create(
        toy_data.images_u8, rng.permutation(toy_data.labels)
    )
    state, history = train_model(
        toy_state,
        toy_data,
        bad_val,
        num_epochs=10,
        batch_size=8,
        seed=42,
        stream_name="es",
        balanced=False,
        augment=False,
        early_stopping_patience=2,
    )
    # must have stopped before 10 epochs (random val labels can't improve long)
    assert len(history["val_loss"]) < 10

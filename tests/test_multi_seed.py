"""Multi-seed fan-out training (train.multi_seed).

Three claims, asserted separately:
- CONTROL FLOW: LaneControl reproduces train_model's scalar plateau /
  early-stop / best-val decisions exactly, lane-by-lane, on synthetic loss
  sequences (numerics-free oracle test).
- NUMERICS: each vmapped lane reproduces the solo ``train_model`` run for
  its seed — same sampling/PRNG streams by construction (engine.epoch_plan),
  trajectories equal to fp-reduction tolerance (same graduated envelope as
  the mesh invariance tests: vmap only changes reduction order).
- SHARDING: the seed axis sharded over an 8-device mesh matches the
  unsharded fan-out.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssip_tpu.models import ResNet18
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.parallel.mesh import MeshSpec, build_mesh
from ssip_tpu.train.engine import DeviceDataset, TrainState, make_optimizer, train_model
from ssip_tpu.train.multi_seed import (
    LaneControl,
    index_state,
    stack_states,
    train_multi_seed,
)

IMG = 32


def _fresh_state(init_seed, optimizer="sgd", lr=1e-3):
    model = ResNet18(num_classes=2)
    variables = seeded_init_host(model, init_seed, (1, IMG, IMG, 3))
    if optimizer == "adamw":
        tx = make_optimizer(lr, 1e-4)
    else:
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=lr)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx,
    )


def _toy_datasets():
    rng = np.random.default_rng(0)
    n = 32
    labels = np.r_[np.zeros(n // 2, np.int64), np.ones(n // 2, np.int64)]
    imgs = np.where(
        labels[:, None, None, None] == 1,
        rng.integers(160, 255, (n, IMG, IMG, 3)),
        rng.integers(0, 96, (n, IMG, IMG, 3)),
    ).astype(np.uint8)
    train = DeviceDataset.create(jnp.asarray(imgs[:24]), labels[:24])
    val = DeviceDataset.create(jnp.asarray(imgs[24:]), labels[24:])
    return train, val


# ---------------------------------------------------------------------------
# Control flow: LaneControl vs a scalar oracle transcribing train_model
# ---------------------------------------------------------------------------


def _scalar_oracle(losses, *, early_patience=3, plateau_patience=2,
                   factor=0.5, lr0=1e-3):
    """train_model's control flow (engine.py driver), one lane, transcribed:
    returns (stop_epoch_or_None, best_epoch, lr trajectory per epoch)."""
    best_val = math.inf
    best_epoch = None
    early = 0
    plateau_best = math.inf
    plateau_bad = 0
    lr = lr0
    lrs = []
    for epoch, v in enumerate(losses):
        if v < plateau_best * (1 - 1e-4):
            plateau_best = v
            plateau_bad = 0
        else:
            plateau_bad += 1
            if plateau_bad > plateau_patience:
                lr *= factor
                plateau_bad = 0
        lrs.append(lr)
        if v < best_val:
            best_val = v
            best_epoch = epoch
            early = 0
        else:
            early += 1
            if early >= early_patience:
                return epoch, best_epoch, lrs
    return None, best_epoch, lrs


def test_lane_control_matches_scalar_oracle():
    """Random val-loss sequences: every lane's stop epoch, best epoch, and
    LR trajectory must match the scalar transcription of train_model."""
    rng = np.random.default_rng(7)
    n_lanes, n_epochs = 16, 20
    losses = rng.uniform(0.1, 2.0, (n_lanes, n_epochs))
    # inject plateaus so the LR cut actually fires on several lanes
    losses[::3, 5:] = losses[::3, 4:5] * 1.0001

    ctl = LaneControl(n_lanes)
    lr = np.full(n_lanes, 1e-3, np.float32)
    stop_epoch = [None] * n_lanes
    best_epoch = [None] * n_lanes
    lr_hist = [[] for _ in range(n_lanes)]
    for epoch in range(n_epochs):
        v = np.where(ctl.stopped, np.inf, losses[:, epoch])
        improved, newly_stopped, lr = ctl.update(v, lr)
        for s in range(n_lanes):
            if improved[s]:
                best_epoch[s] = epoch
            if newly_stopped[s]:
                stop_epoch[s] = epoch
            if stop_epoch[s] is None or stop_epoch[s] == epoch:
                lr_hist[s].append(float(lr[s]))

    for s in range(n_lanes):
        seq = losses[s]
        exp_stop, exp_best, exp_lrs = _scalar_oracle(
            seq[: (stop_epoch[s] + 1) if stop_epoch[s] is not None else n_epochs]
        )
        assert stop_epoch[s] == exp_stop, f"lane {s} stop epoch"
        assert best_epoch[s] == exp_best, f"lane {s} best epoch"
        np.testing.assert_allclose(lr_hist[s], exp_lrs, err_msg=f"lane {s} lr")


def test_lane_control_frozen_after_stop():
    """Stopped lanes are inert: best/LR/counters never change again."""
    ctl = LaneControl(2, early_stopping_patience=1)
    lr = np.array([1e-3, 1e-3], np.float32)
    ctl.update(np.array([1.0, 1.0]), lr)  # both improve (best=1.0)
    _, stopped, lr = ctl.update(np.array([2.0, 0.5]), lr)  # lane0 stops
    assert stopped.tolist() == [True, False]
    best_before = ctl.best_val.copy()
    # lane0 now reports a fantastic loss — must be ignored
    improved, newly, lr2 = ctl.update(np.array([0.001, 0.4]), lr)
    assert improved.tolist() == [False, True]
    assert newly.tolist() == [False, False]
    assert ctl.best_val[0] == best_before[0] == 1.0
    np.testing.assert_array_equal(lr2[0], lr[0])


# ---------------------------------------------------------------------------
# Numerics: lanes reproduce solo runs
# ---------------------------------------------------------------------------


def _solo(seed, datasets, epochs=2):
    train, val = datasets
    state, history = train_model(
        _fresh_state(seed),
        train, val,
        num_epochs=epochs, batch_size=8, seed=seed,
        stream_name="mstest", balanced=True, augment=True,
    )
    return state, history


def _multi(seeds, datasets, epochs=2, mesh=None):
    train, val = datasets
    states = [_fresh_state(s) for s in seeds]
    return train_multi_seed(
        states, train, val,
        seeds=list(seeds), num_epochs=epochs, batch_size=8,
        stream_name="mstest", balanced=True, augment=True, mesh=mesh,
    )


def test_lanes_match_solo_runs():
    """Each lane's SGD trajectory equals its solo run to fp tolerance
    (vmap only changes reduction order — same envelope as the mesh tests:
    epoch 0 tight, epoch 1 loosened by BN-net noise amplification)."""
    datasets = _toy_datasets()
    seeds = (42, 43)
    best_states, histories, summary = _multi(seeds, datasets)

    for lane, seed in enumerate(seeds):
        solo_state, solo_hist = _solo(seed, datasets)
        for key in ("train_loss", "val_loss"):
            np.testing.assert_allclose(
                histories[lane][key][0], solo_hist[key][0], rtol=1e-4,
                err_msg=f"seed {seed} {key}[0]",
            )
            np.testing.assert_allclose(
                histories[lane][key][1], solo_hist[key][1], rtol=5e-2,
                err_msg=f"seed {seed} {key}[1]",
            )
        for key in ("train_acc", "val_acc", "train_f1", "val_f1"):
            np.testing.assert_allclose(
                histories[lane][key][0], solo_hist[key][0],
                err_msg=f"seed {seed} {key}[0]",
            )
        lane_state = index_state(best_states, lane)
        for a, b in zip(
            jax.tree_util.tree_leaves(lane_state.params),
            jax.tree_util.tree_leaves(solo_state.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-4
            )

    # the two seeds genuinely differ (different inits + sampling streams)
    assert not np.allclose(
        histories[0]["train_loss"], histories[1]["train_loss"]
    )
    assert summary[0]["seed"] == 42 and summary[1]["seed"] == 43


def test_seed_axis_sharded_matches_unsharded():
    """8 lanes sharded one-per-device == the same 8 lanes unsharded."""
    datasets = _toy_datasets()
    seeds = tuple(range(8))
    mesh8 = build_mesh(MeshSpec(data=8), devices=jax.devices()[:8])

    _, hist_plain, sum_plain = _multi(seeds, datasets, epochs=2)
    best8, hist_mesh, sum_mesh = _multi(seeds, datasets, epochs=2, mesh=mesh8)

    for lane in range(8):
        np.testing.assert_allclose(
            hist_plain[lane]["train_loss"][0],
            hist_mesh[lane]["train_loss"][0], rtol=1e-4,
        )
        np.testing.assert_allclose(
            hist_plain[lane]["val_loss"], hist_mesh[lane]["val_loss"],
            rtol=5e-2,
        )
    # lanes really are spread over the devices
    leaf = jax.tree_util.tree_leaves(best8.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_tp_mesh_rejected():
    datasets = _toy_datasets()
    mesh_tp = build_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="tensor parallel"):
        _multi((0, 1, 2, 3), datasets, mesh=mesh_tp)


def test_supervised_pipeline_num_seeds(tmp_path):
    """--num-seeds through the supervised pipeline: seed_sweep.csv lands,
    exactly one lane is selected, and the normal artifact set still ships."""
    from PIL import Image

    from ssip_tpu.pipelines.supervised import run_supervised
    from ssip_tpu.pipelines.train_config import TrainingConfig

    gen = np.random.default_rng(5)
    root = tmp_path / "ds"
    for cls, lo, hi in (("cancer", 150, 255), ("normal", 0, 100)):
        d = root / "avec_labels" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                gen.integers(lo, hi, (48, 48, 3), dtype=np.uint8)
            ).save(d / f"{cls}_{i:02d}.jpg")

    out = tmp_path / "outputs"
    results = run_supervised(
        TrainingConfig(
            strong_data_dir=root / "avec_labels",
            batch_size=8,
            image_size=32,
            baseline_epochs=2,
            output_dir=out,
            device="cpu",
            num_seeds=2,
        )
    )
    assert "baseline_thresholded" in results
    import json

    import pandas as pd

    sweep = pd.read_csv(out / "tables" / "seed_sweep.csv")
    assert sweep["seed"].tolist() == [42, 43]
    assert sweep["selected"].sum() == 1
    assert (
        sweep.loc[sweep["selected"], "best_val_loss"].iloc[0]
        == sweep["best_val_loss"].min()
    )
    assert (out / "models" / "baseline_resnet18.pt").exists()
    hist = json.loads((out / "notes" / "training_history.json").read_text())
    assert hist["num_seeds"] == 2
    # the kept history is the selected lane's (epochs_run rows)
    sel_epochs = int(sweep.loc[sweep["selected"], "epochs_run"].iloc[0])
    assert len(hist["baseline"]["val_loss"]) == sel_epochs


def test_stratified_kfold_partition():
    """Every index lands in exactly one val fold; classes spread evenly."""
    from ssip_tpu.data.splits import stratified_kfold_indices

    targets = np.r_[np.zeros(25, np.int64), np.ones(15, np.int64)]
    folds = stratified_kfold_indices(targets, 5, seed=42)
    all_val = np.concatenate([v for _, v in folds])
    assert sorted(all_val.tolist()) == list(range(40))
    for tr, va in folds:
        assert sorted(np.concatenate([tr, va]).tolist()) == list(range(40))
        # stratification: each fold's val has 5 of class 0, 3 of class 1
        assert (targets[va] == 0).sum() == 5
        assert (targets[va] == 1).sum() == 3
    # deterministic
    folds2 = stratified_kfold_indices(targets, 5, seed=42)
    for (a, b), (c, d) in zip(folds, folds2):
        np.testing.assert_array_equal(a, c)
        np.testing.assert_array_equal(b, d)
    with pytest.raises(ValueError):
        stratified_kfold_indices(targets, 1, seed=0)
    # k beyond the largest class count would create empty val folds
    tiny = np.repeat(np.arange(5), 2)  # 5 classes x 2 samples
    with pytest.raises(ValueError, match="largest class count"):
        stratified_kfold_indices(tiny, 4, seed=0)


def test_epoch_plan_pool_padding_uniform():
    """balanced=False with unequal pools: epochs cycle-pad to num_samples so
    lane step counts stay uniform; all indices come from the pool."""
    from ssip_tpu.train.engine import epoch_plan

    rng = np.random.default_rng(2)
    ds = DeviceDataset.create(
        jnp.asarray(rng.integers(0, 255, (12, IMG, IMG, 3), dtype=np.uint8)),
        (np.arange(12) % 2).astype(np.int64),
    )
    pools = [np.array([0, 1, 2, 3]), np.array([4, 5, 6, 7, 8, 9])]
    shapes = set()
    for pool in pools:
        for balanced in (True, False):
            pidx, valid, keys = epoch_plan(
                ds, seed=0, epoch=0, stream_name="t", balanced=balanced,
                batch_size=4, pool=pool, num_samples=6,
            )
            shapes.add(pidx.shape)
            assert set(pidx[valid].tolist()) <= set(pool.tolist())
    assert len(shapes) == 1  # uniform [steps, row] across pools and modes


def test_empty_val_pool_rejected():
    datasets = _toy_datasets()
    with pytest.raises(ValueError, match="non-empty"):
        train_multi_seed(
            [_fresh_state(0), _fresh_state(1)],
            datasets[0], datasets[0],
            seeds=[0, 1], num_epochs=1, batch_size=8, stream_name="t",
            lane_train_pools=[np.arange(4), np.arange(4)],
            lane_val_pools=[np.arange(4), np.array([], np.int64)],
        )


def test_cv_lanes_match_solo_fold_runs():
    """CV mode: each fold-lane reproduces a solo train_model run on that
    fold's subset datasets (equal-size folds → identical sampling streams;
    the pool indirection only changes WHICH rows the shared dataset
    gathers)."""
    from ssip_tpu.data.splits import stratified_kfold_indices

    rng = np.random.default_rng(0)
    n = 32
    labels = (np.arange(n) % 2).astype(np.int64)
    imgs = np.where(
        labels[:, None, None, None] == 1,
        rng.integers(160, 255, (n, IMG, IMG, 3)),
        rng.integers(0, 96, (n, IMG, IMG, 3)),
    ).astype(np.uint8)
    full = DeviceDataset.create(jnp.asarray(imgs), labels)
    folds = stratified_kfold_indices(labels, 2, seed=7)
    assert len(folds[0][1]) == len(folds[1][1])  # equal-size folds

    states = [_fresh_state(0), _fresh_state(0)]
    _, histories, summary = train_multi_seed(
        states, full, full,
        seeds=[42, 42], num_epochs=2, batch_size=8,
        stream_name="cvtest", balanced=True, augment=True,
        lane_train_pools=[f[0] for f in folds],
        lane_val_pools=[f[1] for f in folds],
    )

    for lane, (tr, va) in enumerate(folds):
        solo_train = DeviceDataset.create(jnp.asarray(imgs[tr]), labels[tr])
        solo_val = DeviceDataset.create(jnp.asarray(imgs[va]), labels[va])
        _, solo_hist = train_model(
            _fresh_state(0), solo_train, solo_val,
            num_epochs=2, batch_size=8, seed=42,
            stream_name="cvtest", balanced=True, augment=True,
        )
        for key in ("train_loss", "val_loss"):
            np.testing.assert_allclose(
                histories[lane][key][0], solo_hist[key][0], rtol=1e-4,
                err_msg=f"fold {lane} {key}[0]",
            )
            np.testing.assert_allclose(
                histories[lane][key][1], solo_hist[key][1], rtol=5e-2,
                err_msg=f"fold {lane} {key}[1]",
            )
        for key in ("val_acc", "val_f1"):
            np.testing.assert_allclose(
                histories[lane][key][0], solo_hist[key][0],
                err_msg=f"fold {lane} {key}[0]",
            )
    # the two folds see different data, so their trajectories differ
    assert not np.allclose(
        histories[0]["val_loss"], histories[1]["val_loss"]
    )


def test_cv_unequal_folds_padding_inert():
    """3 folds over 20 samples (8/6/6 val — remainders land in the first
    fold, per class, like sklearn): padded epochs and padded val steps stay
    inert — finite losses, per-fold val metrics over exactly that fold's
    samples."""
    from ssip_tpu.data.splits import stratified_kfold_indices

    rng = np.random.default_rng(1)
    n = 20
    labels = (np.arange(n) % 2).astype(np.int64)
    imgs = rng.integers(0, 255, (n, IMG, IMG, 3), dtype=np.uint8)
    full = DeviceDataset.create(jnp.asarray(imgs), labels)
    folds = stratified_kfold_indices(labels, 3, seed=1)
    sizes = sorted(len(v) for _, v in folds)
    assert sizes == [6, 6, 8]

    states = [_fresh_state(0) for _ in folds]
    _, histories, summary = train_multi_seed(
        states, full, full,
        seeds=[42] * 3, num_epochs=2, batch_size=8,
        stream_name="cvpad", balanced=True, augment=True,
        lane_train_pools=[f[0] for f in folds],
        lane_val_pools=[f[1] for f in folds],
    )
    for h, row in zip(histories, summary):
        assert np.isfinite(h["val_loss"]).all()
        assert np.isfinite(h["train_loss"]).all()
        assert 0.0 <= h["val_acc"][0] <= 1.0
        assert np.isfinite(row["best_val_loss"])


def test_supervised_pipeline_cv_folds(tmp_path):
    """--cv-folds through the supervised pipeline: cv_results.csv lands
    with per-fold rows plus mean/std, and the main run still completes."""
    from PIL import Image

    from ssip_tpu.pipelines.supervised import run_supervised
    from ssip_tpu.pipelines.train_config import TrainingConfig

    gen = np.random.default_rng(6)
    root = tmp_path / "ds"
    for cls, lo, hi in (("cancer", 150, 255), ("normal", 0, 100)):
        d = root / "avec_labels" / cls
        d.mkdir(parents=True)
        for i in range(10):
            Image.fromarray(
                gen.integers(lo, hi, (48, 48, 3), dtype=np.uint8)
            ).save(d / f"{cls}_{i:02d}.jpg")

    out = tmp_path / "outputs"
    results = run_supervised(
        TrainingConfig(
            strong_data_dir=root / "avec_labels",
            batch_size=8,
            image_size=32,
            baseline_epochs=2,
            output_dir=out,
            device="cpu",
            cv_folds=2,
        )
    )
    assert "baseline_thresholded" in results
    import pandas as pd

    cv = pd.read_csv(out / "tables" / "cv_results.csv")
    assert cv["fold"].tolist() == ["0", "1", "mean", "std"]
    fold_rows = cv.iloc[:2]
    assert fold_rows["n_val"].astype(int).sum() == 16  # train+val pool
    mean_row = cv[cv["fold"] == "mean"].iloc[0]
    np.testing.assert_allclose(
        mean_row["val_acc"], fold_rows["val_acc"].mean(), rtol=1e-6
    )


def test_stack_and_index_roundtrip():
    states = [_fresh_state(s) for s in (0, 1, 2)]
    stacked = stack_states(states)
    for i, st in enumerate(states):
        back = index_state(stacked, i)
        for a, b in zip(
            jax.tree_util.tree_leaves(back.params),
            jax.tree_util.tree_leaves(st.params),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

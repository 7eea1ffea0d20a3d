"""Supervised baseline pipeline (reference semantics: supervised.py:38-144).

Flow: seeded split (exact index parity with the reference) → ResNet-18
classifier trained with the jitted engine (balanced sampler, device-side
augmentation, plateau LR, early stop, best-state checkpoint) → argmax test
eval → optional recall-first threshold calibration on val → thresholded test
eval → figures + ``results_comparison.csv``.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ssip_tpu.models import MODEL_FACTORIES
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.port_torch import load_torch_checkpoint
from ssip_tpu.ops.thresholds import select_operating_threshold
from ssip_tpu.pipelines.train_config import TrainingConfig
from ssip_tpu.report.plots import (
    plot_confusion_matrix,
    plot_pr_curves,
    plot_roc_curves,
    plot_training_curves,
)
from ssip_tpu.runtime.logging import get_logger
from ssip_tpu.train.checkpoints import save_checkpoint, variables_of
from ssip_tpu.train.data import load_labeled_dataset, subset
from ssip_tpu.train.engine import DeviceDataset, TrainState, make_optimizer, train_model
from ssip_tpu.train.evaluate import evaluate_model
from ssip_tpu.data.splits import split_dict

LOGGER = get_logger(__name__)


def build_classifier_state(
    config: TrainingConfig, num_classes: int, learning_rate: float,
    seed: Optional[int] = None,
) -> Tuple[TrainState, Any]:
    """Fresh classifier TrainState: ported backbone (if available) + new fc.

    ``seed`` overrides ``config.seed`` for the parameter init — the
    multi-seed fan-out gives each lane its own init stream.
    """
    compute_dtype = (
        jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    )
    extra = (
        {"remat": True}
        if config.remat and config.arch.startswith("vit")
        else {}
    )
    model = MODEL_FACTORIES[config.arch](
        num_classes=num_classes, compute_dtype=compute_dtype, **extra
    )
    variables = seeded_init_host(
        model,
        config.seed if seed is None else seed,
        (1, config.image_size, config.image_size, 3),
    )

    import os

    weights = config.pretrained_weights or os.environ.get("SSIP_RESNET18_WEIGHTS")
    if weights and str(weights):
        from pathlib import Path

        wpath = Path(weights)
        if wpath.exists():
            LOGGER.info("Porting pretrained backbone from %s", wpath)
            ported = load_torch_checkpoint(str(wpath), include_fc=False)
            from ssip_tpu.models.port_torch import check_weights_match_arch

            check_weights_match_arch(ported, config.arch, wpath)
            # keep the freshly-initialized fc head, swap in the backbone
            params = dict(ported["params"])
            params["fc"] = variables["params"]["fc"]
            variables = {"params": params, "batch_stats": ported["batch_stats"]}

    tx = make_optimizer(learning_rate, config.weight_decay)
    state = TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        # stat-free models (ViT) have no batch_stats collection
        batch_stats=variables.get("batch_stats", {}),
        tx=tx,
    )
    return state, model


def prepare_datasets(
    config: TrainingConfig,
) -> Tuple[Dict[str, DeviceDataset], list, Dict[str, np.ndarray], Any, np.ndarray]:
    """(split datasets, classes, split indices, all images, targets)."""
    images, targets, classes, _paths = load_labeled_dataset(
        config.strong_data_dir, config.image_size, num_threads=config.num_workers
    )
    splits = split_dict(targets.tolist(), config.val_split, config.test_split, config.seed)
    datasets = {
        name: subset(images, targets, idx) for name, idx in splits.items()
    }
    return datasets, classes, splits, images, targets


def _train_baseline_multi_seed(
    config: TrainingConfig, datasets, num_classes: int, mesh
):
    """--num-seeds fan-out: N seeds trained in one vmapped program, best
    (by val loss, the reference's checkpoint criterion) kept. Writes the
    per-seed summary to tables/seed_sweep.csv."""
    import pandas as pd

    from ssip_tpu.train.multi_seed import index_state, train_multi_seed

    reg = config.artifacts
    seeds = [config.seed + i for i in range(config.num_seeds)]
    if config.resume:
        LOGGER.warning(
            "--resume is not supported with --num-seeds > 1; training "
            "without mid-run snapshots"
        )
    states = [
        build_classifier_state(config, num_classes, config.learning_rate, seed=s)[0]
        for s in seeds
    ]
    t0 = time.time()
    best_states, histories, summary = train_multi_seed(
        states,
        datasets["train"],
        datasets["val"],
        seeds=seeds,
        num_epochs=config.baseline_epochs,
        batch_size=config.batch_size,
        stream_name="baseline",
        balanced=True,
        augment=True,
        early_stopping_patience=config.early_stopping_patience,
        mesh=mesh,
    )
    train_time = time.time() - t0
    best_lane = int(np.argmin([row["best_val_loss"] for row in summary]))
    for row in summary:
        row["selected"] = row["seed"] == seeds[best_lane]
    reg.tables_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(summary).to_csv(reg.seed_sweep_csv, index=False)
    LOGGER.info(
        "Seed sweep: best seed %d (val loss %.4f of %s)",
        seeds[best_lane], summary[best_lane]["best_val_loss"],
        [round(r["best_val_loss"], 4) for r in summary],
    )
    state = index_state(best_states, best_lane)
    save_checkpoint(reg.baseline_checkpoint, variables_of(state))
    return state, histories[best_lane], train_time


def _run_cross_validation(
    config: TrainingConfig, datasets, num_classes: int, mesh
) -> None:
    """--cv-folds: stratified k-fold CV over the train+val pool (test split
    held out), all folds trained simultaneously as vmapped lanes. Writes
    per-fold + mean/std validation metrics to tables/cv_results.csv."""
    import jax.numpy as _jnp
    import pandas as pd

    from ssip_tpu.data.splits import stratified_kfold_indices
    from ssip_tpu.parallel.mesh import MODEL_AXIS
    from ssip_tpu.train.multi_seed import train_multi_seed

    reg = config.artifacts
    if mesh is not None and mesh.shape.get(MODEL_AXIS, 1) != 1:
        LOGGER.warning(
            "--cv-folds repurposes the mesh data axis for the fold fan-out "
            "and cannot combine with --mesh-model; running CV lanes "
            "unsharded (the main run keeps its tensor-parallel mesh)"
        )
        mesh = None
    # the train+val images are already device-resident — concatenate on
    # device instead of re-uploading through the (slow) host→device link
    pool_ds = DeviceDataset.create(
        _jnp.concatenate(
            [datasets["train"].images_u8, datasets["val"].images_u8]
        ),
        np.concatenate([datasets["train"].labels, datasets["val"].labels]),
    )
    folds = stratified_kfold_indices(
        pool_ds.labels, config.cv_folds, config.seed
    )
    states = [
        build_classifier_state(config, num_classes, config.learning_rate)[0]
        for _ in folds
    ]
    _, histories, summary = train_multi_seed(
        states, pool_ds, pool_ds,
        seeds=[config.seed] * len(folds),
        num_epochs=config.baseline_epochs,
        batch_size=config.batch_size,
        stream_name="cv",
        balanced=True,
        augment=True,
        early_stopping_patience=config.early_stopping_patience,
        mesh=mesh,
        lane_train_pools=[f[0] for f in folds],
        lane_val_pools=[f[1] for f in folds],
    )
    rows = []
    for f, (h, row, (tr, va)) in enumerate(zip(histories, summary, folds)):
        best_ep = int(np.argmin(h["val_loss"]))
        rows.append(
            {
                "fold": f,
                "n_train": len(tr),
                "n_val": len(va),
                "best_val_loss": row["best_val_loss"],
                "val_acc": h["val_acc"][best_ep],
                "val_f1": h["val_f1"][best_ep],
                "epochs_run": row["epochs_run"],
                "stopped_early": row["stopped_early"],
            }
        )
    df = pd.DataFrame(rows)
    stats = ("best_val_loss", "val_acc", "val_f1")
    rows.append({"fold": "mean", **{k: float(df[k].mean()) for k in stats}})
    rows.append({"fold": "std", **{k: float(df[k].std(ddof=0)) for k in stats}})
    reg.tables_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(rows).to_csv(reg.cv_results_csv, index=False)
    LOGGER.info(
        "%d-fold CV: val_acc %.3f ± %.3f, val_f1 %.3f ± %.3f → %s",
        len(folds), df["val_acc"].mean(), df["val_acc"].std(ddof=0),
        df["val_f1"].mean(), df["val_f1"].std(ddof=0), reg.cv_results_csv,
    )


def run_supervised(config: TrainingConfig) -> Dict[str, Dict[str, float]]:
    from ssip_tpu.runtime.device import force_cpu_platform_if_requested
    from ssip_tpu.runtime.jaxconfig import setup_jax

    force_cpu_platform_if_requested(config.device)
    setup_jax()
    reg = config.artifacts

    datasets, classes, splits, _, _ = prepare_datasets(config)
    if config.positive_class not in classes:
        raise ValueError(
            f"Positive class '{config.positive_class}' not found in dataset classes: {classes}"
        )
    pos_index = classes.index(config.positive_class)

    mesh = config.build_mesh()
    LOGGER.info("Training mesh: %s", dict(mesh.shape))

    if config.cv_folds:
        if config.cv_folds < 2:
            raise ValueError(
                f"--cv-folds must be >= 2 (or 0 to disable), got {config.cv_folds}"
            )
        _run_cross_validation(config, datasets, len(classes), mesh)

    if config.num_seeds > 1:
        state, history, train_time = _train_baseline_multi_seed(
            config, datasets, len(classes), mesh
        )
    else:
        state, _model = build_classifier_state(
            config, len(classes), config.learning_rate
        )
        t0 = time.time()
        state, history = train_model(
            state,
            datasets["train"],
            datasets["val"],
            num_epochs=config.baseline_epochs,
            batch_size=config.batch_size,
            seed=config.seed,
            stream_name="baseline",
            resume_path=config.resume_path("baseline"),
            balanced=True,
            augment=True,
            early_stopping_patience=config.early_stopping_patience,
            checkpoint_fn=lambda s: save_checkpoint(
                reg.baseline_checkpoint, variables_of(s)
            ),
            mesh=mesh,
            fsdp=config.mesh_fsdp,
        )
        train_time = time.time() - t0

    arg_metrics, arg_y_true, arg_y_pred, y_prob_test = evaluate_model(
        state, datasets["test"], config.batch_size, mesh=mesh,
        fsdp=config.mesh_fsdp,
    )
    arg_metrics["training_time_sec"] = train_time

    if config.target_recall is not None:
        _m, y_true_val, _p, y_prob_val = evaluate_model(
            state, datasets["val"], config.batch_size, pos_index=pos_index,
            mesh=mesh, fsdp=config.mesh_fsdp,
        )
        thr, thr_meta = select_operating_threshold(
            (y_true_val == pos_index).astype(int),
            y_prob_val,
            target_recall=float(config.target_recall),
            min_precision=config.min_precision,
            max_fpr=config.max_fpr,
            f_beta=config.f_beta,
        )
        thr_metrics, thr_y_true, thr_y_pred, thr_y_prob = evaluate_model(
            state, datasets["test"], config.batch_size,
            pos_index=pos_index, threshold=thr, mesh=mesh,
            fsdp=config.mesh_fsdp,
        )
        thr_metrics.update(
            threshold=float(thr),
            target_recall=float(config.target_recall),
            min_precision=None if config.min_precision is None else float(config.min_precision),
            max_fpr=None if config.max_fpr is None else float(config.max_fpr),
            threshold_policy=thr_meta.get("policy", "unknown"),
        )
    else:
        thr = None
        thr_metrics = dict(arg_metrics)
        thr_y_true, thr_y_pred, thr_y_prob = arg_y_true, arg_y_pred, y_prob_test
        thr_metrics.update(
            threshold=None, target_recall=None, min_precision=None,
            max_fpr=None, threshold_policy="disabled",
        )
    thr_metrics["training_time_sec"] = train_time

    plot_training_curves(history, reg.baseline_curves_png, "Baseline")
    plot_confusion_matrix(arg_y_true, arg_y_pred, classes, reg.baseline_confusion_png)
    y_true_bin = (thr_y_true == pos_index).astype(int)
    plot_roc_curves({"Baseline": (y_true_bin, thr_y_prob)}, reg.roc_curves_png)
    plot_pr_curves(
        {"Baseline": (y_true_bin, thr_y_prob)},
        reg.figures_dir / "pr_curves_baseline.png",
    )

    import pandas as pd

    reg.tables_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame.from_dict({"baseline_thresholded": thr_metrics}, orient="index").to_csv(
        reg.results_comparison_csv
    )

    # persist split indices for post-hoc tooling (threshold_sweep)
    import json

    reg.notes_dir.mkdir(parents=True, exist_ok=True)
    history_payload = {
        "arch": config.arch,
        "image_size": int(config.image_size),
        "baseline": history,
        "splits": {k: np.asarray(v).tolist() for k, v in splits.items()},
    }
    if config.num_seeds > 1:
        history_payload["num_seeds"] = config.num_seeds
    reg.training_history_json.write_text(json.dumps(history_payload, indent=2))

    return {"baseline_thresholded": thr_metrics, "baseline_argmax": arg_metrics}

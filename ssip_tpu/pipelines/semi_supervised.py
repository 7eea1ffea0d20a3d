"""Semi-supervised pipeline: baseline → pseudo-label → weak pretrain → finetune.

TPU-native re-design of the reference flagship workflow (call stack:
SURVEY.md §3.2; reference src/training/semi_supervised.py:75-516):

Phase A  baseline ResNet-18 on the strong labeled split
Phase B  pseudo-label the (optionally cohort-filtered) unlabeled pool at
         confidence ≥ 0.7 using batched jitted inference
Phase C  fresh model, backbone frozen (gradient-masked) — head-only pretrain
         on pseudo-labels with a balanced sampler
Phase D  unfreeze everything, fine-tune on strong labels at lr/2
Then: argmax + recall-first thresholded evaluation of both models, training
histories (+ split indices + pseudo count), 8 figures, comparison tables,
``operating_point.json``, and the triage CSV over the full unlabeled pool.

All four phases run on device-resident data; phase transitions (pseudo-label
selection, cohort filtering) are the only host round-trips — exactly the
data-dependent-shape boundaries XLA cannot trace through.
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ssip_tpu.data.discovery import unlabeled_files
from ssip_tpu.ops.metrics import binary_confusion_metrics
from ssip_tpu.ops.thresholds import select_operating_threshold
from ssip_tpu.pipelines.supervised import build_classifier_state, prepare_datasets
from ssip_tpu.pipelines.train_config import TrainingConfig
from ssip_tpu.report.plots import (
    plot_confusion_matrix,
    plot_metrics_bars,
    plot_pr_curves,
    plot_roc_curves,
    plot_training_curves,
)
from ssip_tpu.runtime.logging import get_logger
from ssip_tpu.train.checkpoints import save_checkpoint, variables_of
from ssip_tpu.train.data import load_unlabeled_dataset
from ssip_tpu.train.engine import (
    DeviceDataset,
    TrainState,
    make_optimizer,
    train_model,
)
from ssip_tpu.train.evaluate import evaluate_model
from ssip_tpu.train.pseudo_label import generate_pseudo_labels

LOGGER = get_logger(__name__)


def resolve_cohort_paths(
    cohort_csv: Path, weak_data_dir: Path
) -> set[str]:
    """Resolve cohort CSV 'path' entries against the weak pool directory.

    Path-matching semantics: reference semi_supervised.py:191-228 — accepts
    absolute paths, weak-dir-relative paths, paths prefixed with the weak
    dir's name, and bare filenames.
    """
    cohort_csv = Path(cohort_csv)
    if not cohort_csv.exists():
        raise FileNotFoundError(f"Cohort CSV not found: {cohort_csv}")
    df = pd.read_csv(cohort_csv)
    if "path" not in df.columns:
        raise ValueError("Cohort CSV must contain a 'path' column")
    weak_name = Path(weak_data_dir).name
    allowed: set[str] = set()
    for p in df["path"].astype(str).tolist():
        pp = Path(p)
        candidates = set()
        if pp.is_absolute():
            candidates.add(pp.resolve())
        else:
            candidates.add((weak_data_dir / pp).resolve())
            parts = pp.parts
            if len(parts) > 1 and parts[0] == weak_name:
                candidates.add((weak_data_dir / Path(*parts[1:])).resolve())
            if len(parts) == 1:
                candidates.add((weak_data_dir / pp.name).resolve())
        allowed.update(str(c) for c in candidates)
    return allowed


def _threshold_and_eval(
    state, datasets, config: TrainingConfig, pos_index: int, label: str,
    mesh=None,
):
    """(argmax + thresholded) eval pair for one model."""
    arg_metrics, arg_y_true, arg_y_pred, y_prob = evaluate_model(
        state, datasets["test"], config.batch_size, mesh=mesh,
        fsdp=config.mesh_fsdp,
    )
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
        LOGGER.info(
            "%s operating point: thr=%.4f policy=%s", label, thr, thr_meta.get("policy")
        )
    else:
        thr = None
        thr_metrics = dict(arg_metrics)
        thr_metrics.update(
            threshold=None, target_recall=None, min_precision=None, max_fpr=None,
            threshold_policy="disabled",
        )
        thr_y_true, thr_y_pred, thr_y_prob = arg_y_true, arg_y_pred, y_prob
    return (
        arg_metrics, arg_y_true, arg_y_pred, y_prob,
        thr, thr_metrics, thr_y_true, thr_y_pred, thr_y_prob,
    )


def run_pipeline(config: TrainingConfig) -> Dict[str, Dict[str, float]]:
    from ssip_tpu.runtime.device import force_cpu_platform_if_requested
    from ssip_tpu.runtime.jaxconfig import setup_jax

    force_cpu_platform_if_requested(config.device)
    setup_jax()
    reg = config.artifacts
    if config.weak_data_dir is None:
        raise ValueError("semi-supervised pipeline requires weak_data_dir")

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
        from ssip_tpu.pipelines.supervised import _run_cross_validation

        _run_cross_validation(config, datasets, len(classes), mesh)

    # ---- Phase A: baseline ------------------------------------------------
    if config.num_seeds > 1:
        # seed fan-out (TPU extra): the best-of-N baseline also becomes the
        # pseudo-labeler, so the whole semi pipeline downstream benefits
        from ssip_tpu.pipelines.supervised import _train_baseline_multi_seed

        baseline_state, baseline_history, baseline_time = (
            _train_baseline_multi_seed(config, datasets, len(classes), mesh)
        )
    else:
        baseline_state, _ = build_classifier_state(config, len(classes), config.learning_rate)
        t0 = time.time()
        baseline_state, baseline_history = train_model(
            baseline_state,
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
            checkpoint_fn=lambda s: save_checkpoint(reg.baseline_checkpoint, variables_of(s)),
            mesh=mesh,
            fsdp=config.mesh_fsdp,
        )
        baseline_time = time.time() - t0
    plot_training_curves(baseline_history, reg.baseline_curves_png, "Baseline")

    (
        base_arg_metrics, base_arg_y_true, base_arg_y_pred, base_y_prob,
        thr_baseline, base_thr_metrics, base_thr_y_true, base_thr_y_pred,
        base_thr_y_prob,
    ) = _threshold_and_eval(
        baseline_state, datasets, config, pos_index, "baseline", mesh=mesh
    )
    base_arg_metrics["training_time_sec"] = baseline_time
    base_thr_metrics["training_time_sec"] = baseline_time

    # ---- Phase B: pseudo-labeling ----------------------------------------
    keep_paths = None
    if config.unlabeled_cohort_csv is not None:
        allowed = resolve_cohort_paths(
            Path(config.unlabeled_cohort_csv), Path(config.weak_data_dir)
        )
        pool_all = unlabeled_files(Path(config.weak_data_dir))
        keep_paths = [p for p in pool_all if str(p.resolve()) in allowed]
        LOGGER.info(
            "Filtered unlabeled pool via cohort CSV: %d -> %d images (%d excluded)",
            len(pool_all), len(keep_paths), len(pool_all) - len(keep_paths),
        )
        if not keep_paths:
            raise RuntimeError(
                "Cohort filtering removed all unlabeled images; "
                "check the CSV paths match --weak-data-dir."
            )
    pool_images, pool_paths = load_unlabeled_dataset(
        Path(config.weak_data_dir), config.image_size,
        keep_paths=keep_paths, num_threads=config.num_workers,
    )

    keep_idx, pseudo_labels, pseudo_conf = generate_pseudo_labels(
        baseline_state.apply_fn,
        variables_of(baseline_state),
        pool_images,
        config.batch_size,
        config.pseudo_label_threshold,
        mesh=mesh,
    )
    if len(keep_idx) == 0:
        raise RuntimeError(
            "No pseudo-labelled samples were generated. Try lowering the threshold."
        )
    LOGGER.info(
        "Pseudo-labeling kept %d/%d pool images (threshold %.2f)",
        len(keep_idx), len(pool_paths), config.pseudo_label_threshold,
    )
    pseudo_dataset = DeviceDataset.create(
        pool_images[jnp.asarray(keep_idx)], pseudo_labels
    )

    # ---- Phase C: weak pretrain (backbone frozen) ------------------------
    semi_state, _model = build_classifier_state(config, len(classes), config.learning_rate)
    trainable_mask = jax.tree_util.tree_map_with_path(
        lambda path, _: str(path[0].key if hasattr(path[0], "key") else path[0]) == "fc",
        semi_state.params,
    )
    t0 = time.time()
    semi_state, pretrain_history = train_model(
        semi_state,
        pseudo_dataset,
        datasets["val"],
        num_epochs=config.weak_pretrain_epochs,
        batch_size=config.batch_size,
        seed=config.seed,
        stream_name="semi_pretrain",
        resume_path=config.resume_path("semi_pretrain"),
        balanced=True,
        augment=True,
        early_stopping_patience=config.early_stopping_patience,
        trainable_mask=trainable_mask,
        mesh=mesh,
        fsdp=config.mesh_fsdp,
    )

    # ---- Phase D: fine-tune (unfrozen, lr/2) -----------------------------
    finetune_tx = make_optimizer(config.learning_rate / 2, config.weight_decay)
    semi_state = TrainState.create(
        apply_fn=semi_state.apply_fn,
        params=semi_state.params,
        batch_stats=semi_state.batch_stats,
        tx=finetune_tx,
    )
    if config.consistency_weight > 0:
        from ssip_tpu.train.consistency import train_fixmatch

        LOGGER.info(
            "Fine-tuning with augmentation-consistency (λ=%.2f, τ=%.2f)",
            config.consistency_weight, config.consistency_threshold,
        )
        semi_state, finetune_history = train_fixmatch(
            semi_state,
            datasets["train"],
            datasets["val"],
            pool_images,
            num_epochs=config.finetune_epochs,
            batch_size=config.batch_size,
            unlabeled_batch_size=config.batch_size,
            seed=config.seed,
            stream_name="semi_finetune",
            consistency_weight=config.consistency_weight,
            confidence_threshold=config.consistency_threshold,
            strong_aug=config.strong_augment,
            ema_decay=config.ema_decay,
            early_stopping_patience=config.early_stopping_patience,
            resume_path=config.resume_path("semi_finetune"),
            mesh=mesh,
            fsdp=config.mesh_fsdp,
        )
        save_checkpoint(reg.semi_checkpoint, variables_of(semi_state))
        # keep the history schema uniform for the combined curves figure
        finetune_history = {
            k: v for k, v in finetune_history.items()
            if k in pretrain_history
        }
    else:
        semi_state, finetune_history = train_model(
            semi_state,
            datasets["train"],
            datasets["val"],
            num_epochs=config.finetune_epochs,
            batch_size=config.batch_size,
            seed=config.seed,
            stream_name="semi_finetune",
            balanced=True,
            resume_path=config.resume_path("semi_finetune"),
            augment=True,
            early_stopping_patience=config.early_stopping_patience,
            checkpoint_fn=lambda s: save_checkpoint(reg.semi_checkpoint, variables_of(s)),
            mesh=mesh,
            fsdp=config.mesh_fsdp,
        )
    semi_time = time.time() - t0

    (
        semi_arg_metrics, semi_arg_y_true, semi_arg_y_pred, semi_y_prob,
        thr_semi, semi_thr_metrics, semi_thr_y_true, semi_thr_y_pred,
        semi_thr_y_prob,
    ) = _threshold_and_eval(semi_state, datasets, config, pos_index, "semi", mesh=mesh)
    semi_arg_metrics["training_time_sec"] = semi_time
    semi_thr_metrics["training_time_sec"] = semi_time

    # ---- artifacts -------------------------------------------------------
    history_payload = {
        "arch": config.arch,
        "image_size": int(config.image_size),
        "baseline": baseline_history,
        "semi_pretrain": pretrain_history,
        "semi_finetune": finetune_history,
        "splits": {k: np.asarray(v).tolist() for k, v in splits.items()},
        "pseudo_label_count": int(len(keep_idx)),
    }
    reg.notes_dir.mkdir(parents=True, exist_ok=True)
    reg.training_history_json.write_text(json.dumps(history_payload, indent=2))

    plot_training_curves(
        {
            key: pretrain_history[key] + finetune_history[key]
            for key in pretrain_history
        },
        reg.semi_curves_png,
        "Semi-supervised",
    )
    plot_confusion_matrix(base_arg_y_true, base_arg_y_pred, classes, reg.baseline_confusion_png)
    plot_confusion_matrix(
        base_thr_y_true, base_thr_y_pred, classes, reg.baseline_confusion_thresholded_png
    )
    plot_confusion_matrix(semi_arg_y_true, semi_arg_y_pred, classes, reg.semi_confusion_png)
    plot_confusion_matrix(
        semi_thr_y_true, semi_thr_y_pred, classes, reg.semi_confusion_thresholded_png
    )

    baseline_bin = (base_thr_y_true == pos_index).astype(int)
    semi_bin = (semi_thr_y_true == pos_index).astype(int)
    plot_roc_curves(
        {
            "Baseline": (baseline_bin, base_thr_y_prob),
            "Semi-supervised": (semi_bin, semi_thr_y_prob),
        },
        reg.roc_curves_png,
    )
    plot_pr_curves(
        {
            "Baseline": (baseline_bin, base_thr_y_prob),
            "Semi-supervised": (semi_bin, semi_thr_y_prob),
        },
        reg.pr_curves_png,
    )

    detailed_rows: Dict[str, Dict[str, Any]] = {}
    detailed_rows["baseline_argmax"] = binary_confusion_metrics(
        base_arg_y_true, base_arg_y_pred, pos_index
    ) | {
        "threshold": None, "target_recall": None,
        "training_time_sec": baseline_time,
    }
    detailed_rows["baseline_thresholded"] = binary_confusion_metrics(
        base_thr_y_true, base_thr_y_pred, pos_index
    ) | {
        "threshold": None if thr_baseline is None else float(thr_baseline),
        "target_recall": None if config.target_recall is None else float(config.target_recall),
        "training_time_sec": baseline_time,
        "min_precision": base_thr_metrics.get("min_precision"),
        "max_fpr": base_thr_metrics.get("max_fpr"),
    }
    detailed_rows["semi_argmax"] = binary_confusion_metrics(
        semi_arg_y_true, semi_arg_y_pred, pos_index
    ) | {
        "threshold": None, "target_recall": None, "training_time_sec": semi_time,
    }
    detailed_rows["semi_thresholded"] = binary_confusion_metrics(
        semi_thr_y_true, semi_thr_y_pred, pos_index
    ) | {
        "threshold": None if thr_semi is None else float(thr_semi),
        "target_recall": None if config.target_recall is None else float(config.target_recall),
        "training_time_sec": semi_time,
        "min_precision": semi_thr_metrics.get("min_precision"),
        "max_fpr": semi_thr_metrics.get("max_fpr"),
    }
    reg.tables_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame.from_dict(detailed_rows, orient="index").to_csv(
        reg.results_comparison_detailed_csv
    )
    plot_metrics_bars(
        detailed_rows,
        reg.metrics_comparison_png,
        keys=["TPR", "FPR", "TNR", "precision", "accuracy"],
    )
    pd.DataFrame.from_dict(
        {
            "baseline_thresholded": base_thr_metrics,
            "semi_thresholded": semi_thr_metrics,
        },
        orient="index",
    ).to_csv(reg.results_comparison_csv)

    # operating point manifest
    try:
        op_payload = {
            "model": f"semi_supervised_{config.arch}",
            "arch": config.arch,
            "image_size": int(config.image_size),
            "checkpoint": str(reg.semi_checkpoint),
            "positive_class": config.positive_class,
            "classes": list(classes),  # serving derives pos_index from this
            "threshold": semi_thr_metrics.get("threshold"),
            "policy": semi_thr_metrics.get("threshold_policy"),
            "target_recall": config.target_recall,
            "min_precision": config.min_precision,
            "max_fpr": config.max_fpr,
            "seed": config.seed,
        }
        reg.operating_point_json.write_text(json.dumps(op_payload, indent=2))
    except Exception as exc:  # pragma: no cover
        LOGGER.warning("Failed to write operating_point.json: %s", exc)

    # triage CSV over the FULL unlabeled pool (unfiltered)
    try:
        triage_thr = semi_thr_metrics.get("threshold")
        if triage_thr is not None:
            if keep_paths is not None:
                triage_images, triage_paths = load_unlabeled_dataset(
                    Path(config.weak_data_dir), config.image_size,
                    num_threads=config.num_workers,
                )
            else:
                triage_images, triage_paths = pool_images, pool_paths
            probs = _pool_probabilities(
                semi_state, triage_images, config.batch_size, pos_index,
                mesh=mesh,
            )
            df_triage = pd.DataFrame(
                {
                    "path": [str(p) for p in triage_paths],
                    "prob_positive": probs,
                    "flagged": probs >= float(triage_thr),
                }
            )
            df_triage.to_csv(reg.triage_csv, index=False)
            LOGGER.info(
                "Wrote triage CSV with %d rows (%d flagged) to %s",
                len(df_triage), int(df_triage["flagged"].sum()), reg.triage_csv,
            )
        else:
            LOGGER.info("Skipping triage CSV: no threshold selected")
    except Exception as exc:  # pragma: no cover
        LOGGER.warning("Failed to write triage CSV: %s", exc)

    return {
        "baseline_thresholded": base_thr_metrics,
        "semi_thresholded": semi_thr_metrics,
    }


def _pool_probabilities(
    state: TrainState, pool_images: jax.Array, batch_size: int, pos_index: int,
    mesh=None,
) -> np.ndarray:
    from ssip_tpu.train.pseudo_label import pool_probabilities

    probs = pool_probabilities(
        state.apply_fn, variables_of(state), pool_images, batch_size, mesh=mesh
    )
    return probs[:, pos_index]

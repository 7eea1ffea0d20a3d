"""Augmentation-consistency (FixMatch-style) semi-supervised training.

Optional extension beyond the reference's pseudo-label pipeline, named in the
rebuild's north star ("augmentation-consistency losses"): alongside each
labeled step, an unlabeled batch contributes

    λ · CE( logits(strong_aug(u)), argmax p_weak(u) ) · 1[max p_weak ≥ τ]

where the weak view (flip-only) produces the pseudo-target under
``stop_gradient``. The whole epoch — labeled supervision + consistency — is
one fused ``lax.scan`` dispatch, same as the plain engine.

Enable via ``--consistency-weight λ`` (τ via ``--consistency-threshold``) on
the semi-supervised CLI; default off keeps reference behavior.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssip_tpu.ops.augment import strong_augment, train_augment, weak_augment
from ssip_tpu.runtime.logging import get_logger
from ssip_tpu.runtime.prng import epoch_key
from ssip_tpu.train.engine import TrainState, _stacked_epoch

LOGGER = get_logger(__name__)


def make_fixmatch_epoch(
    consistency_weight: float,
    confidence_threshold: float,
    rotate_degrees: float = 10.0,
    trainable_mask: Optional[Any] = None,
    strong_aug: str = "jitter",
    ema_decay: float = 0.0,
):
    """Whole-epoch jit: labeled CE + masked consistency CE per step.

    ``strong_aug`` picks the strong view: ``"jitter"`` (default —
    flip/rotate/brightness/contrast, ops/augment.py) or ``"randaugment"``
    (the FixMatch paper's RandAugment+Cutout policy, ops/randaugment.py).

    ``ema_decay`` > 0 enables a Mean-Teacher-style EMA teacher (Tarvainen &
    Valpola 2017; FixMatch reports its metrics on the EMA model): the weak
    view's pseudo-targets come from an exponential moving average of the
    student's params, updated after each optimizer step
    (``ema = d·ema + (1-d)·params``). The returned epoch fn then takes an
    extra ``ema_params`` argument and returns the updated average first.
    At 0 (default) the teacher is the live student — the plain FixMatch
    step — and the signature is unchanged.
    """
    if strong_aug not in ("jitter", "randaugment"):
        raise ValueError(f"unknown strong_aug {strong_aug!r}")
    if not 0.0 <= ema_decay < 1.0:
        raise ValueError(f"ema_decay={ema_decay} must be in [0, 1)")
    if strong_aug == "randaugment":
        from ssip_tpu.ops.randaugment import strong_augment_randaugment

        strong_fn = lambda u8, key: strong_augment_randaugment(u8, key)  # noqa: E731
    else:
        strong_fn = lambda u8, key: strong_augment(u8, key, rotate_degrees)  # noqa: E731
    use_ema = ema_decay > 0.0

    def _step(state: TrainState, ema_params, xs):
        u8, lab, val, unl, key = xs
        k_sup, k_weak, k_strong = jax.random.split(key, 3)

        x_sup = train_augment(u8, k_sup, rotate_degrees)
        x_weak = weak_augment(unl, k_weak)
        x_strong = strong_fn(unl, k_strong)
        teacher_params = ema_params if use_ema else state.params

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits_sup, new_model_state = state.apply_fn(
                variables, x_sup, train=True, mask=val,
                mutable=["batch_stats", "aux"],
            )
            # model-sown auxiliary objectives (MoE load-balance,
            # models/moe.py) — captured from the supervised view before
            # the strong-view apply rebinds new_model_state; the strong
            # view's sow is dropped (batch_stats-only mutable) so the
            # balance pressure is counted once per step, mirroring
            # engine._step_core
            aux_terms = jax.tree.leaves(dict(new_model_state).get("aux", {}))
            w = val.astype(jnp.float32)
            sup_loss = jnp.sum(
                optax.softmax_cross_entropy_with_integer_labels(logits_sup, lab) * w
            ) / jnp.maximum(jnp.sum(w), 1.0)

            # weak view defines pseudo-targets (no grad, frozen stats);
            # the teacher is the EMA params when enabled, else the student
            logits_weak = state.apply_fn(
                {"params": teacher_params, "batch_stats": state.batch_stats},
                x_weak, train=False,
            )
            probs_weak = jax.lax.stop_gradient(jax.nn.softmax(logits_weak, axis=1))
            conf = jnp.max(probs_weak, axis=1)
            pseudo = jnp.argmax(probs_weak, axis=1)
            keep = (conf >= confidence_threshold).astype(jnp.float32)

            logits_strong, new_model_state = state.apply_fn(
                {
                    "params": params,
                    # stat-free models (ViT) mutate nothing
                    "batch_stats": dict(new_model_state).get(
                        "batch_stats", state.batch_stats
                    ),
                },
                x_strong, train=True, mutable=["batch_stats"],
            )
            cons_loss = jnp.sum(
                optax.softmax_cross_entropy_with_integer_labels(
                    logits_strong, pseudo
                )
                * keep
            ) / jnp.maximum(jnp.sum(keep), 1.0)

            total = sup_loss + consistency_weight * cons_loss
            for term in aux_terms:
                total = total + jnp.sum(term)
            return total, (logits_sup, new_model_state, sup_loss, cons_loss, keep)

        (loss, (logits, new_model_state, sup_loss, cons_loss, keep)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )
        if trainable_mask is not None:
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
            )
        updates, new_opt_state = state.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        if trainable_mask is not None:
            new_params = jax.tree.map(
                lambda new, old, m: new if m else old,
                new_params, state.params, trainable_mask,
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=dict(new_model_state).get(
                "batch_stats", state.batch_stats
            ),
            opt_state=new_opt_state,
        )
        new_ema = (
            jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema_params, new_params,
            )
            if use_ema
            else None
        )
        metrics = (loss, sup_loss, cons_loss, jnp.mean(keep),
                   jnp.argmax(logits, axis=1))
        return new_state, new_ema, metrics

    if use_ema:

        @jax.jit
        def fixmatch_epoch_ema(
            state: TrainState,
            ema_params,
            images_u8: jax.Array,     # [S, B, H, W, 3] labeled
            labels: jax.Array,        # [S, B]
            valid: jax.Array,         # [S, B]
            unlabeled_u8: jax.Array,  # [S, U, H, W, 3]
            keys: jax.Array,          # [S]
        ):
            def step(carry, xs):
                state, ema = carry
                new_state, new_ema, metrics = _step(state, ema, xs)
                return (new_state, new_ema), metrics

            (state, ema_params), (losses, sup_losses, cons_losses, keep_rates,
                                  preds) = jax.lax.scan(
                step, (state, ema_params),
                (images_u8, labels, valid, unlabeled_u8, keys),
            )
            return (state, ema_params, losses, sup_losses, cons_losses,
                    keep_rates, preds)

        return fixmatch_epoch_ema

    @jax.jit
    def fixmatch_epoch(
        state: TrainState,
        images_u8: jax.Array,     # [S, B, H, W, 3] labeled
        labels: jax.Array,        # [S, B]
        valid: jax.Array,         # [S, B]
        unlabeled_u8: jax.Array,  # [S, U, H, W, 3]
        keys: jax.Array,          # [S]
    ):
        def step(carry, xs):
            new_state, _, metrics = _step(carry, None, xs)
            return new_state, metrics

        state, (losses, sup_losses, cons_losses, keep_rates, preds) = jax.lax.scan(
            step, state, (images_u8, labels, valid, unlabeled_u8, keys)
        )
        return state, losses, sup_losses, cons_losses, keep_rates, preds

    return fixmatch_epoch


def train_fixmatch(
    state: TrainState,
    train_dataset,
    val_dataset,
    unlabeled_images: jax.Array,
    *,
    num_epochs: int,
    batch_size: int,
    unlabeled_batch_size: int,
    seed: int,
    stream_name: str,
    consistency_weight: float,
    confidence_threshold: float,
    early_stopping_patience: int = 3,
    plateau_patience: int = 2,
    plateau_factor: float = 0.5,
    resume_path: Optional[Any] = None,
    mesh=None,
    fsdp: bool = False,
    strong_aug: str = "jitter",
    ema_decay: float = 0.0,
) -> Tuple[TrainState, dict]:
    """Epoch driver mirroring ``train_model``'s control flow + consistency.

    ``resume_path`` gives the consistency finetune phase the same
    preemption-safe per-epoch snapshot/restore as every other phase
    (ADVICE r1) — the driver state is train_model's plus the two
    consistency history keys, which ride along inside ``history``.

    ``mesh``/``fsdp``: the same data-parallel (and ZeRO-3) placement the
    plain engine uses — both the labeled and the unlabeled batch axes
    shard over the data axis.

    ``ema_decay`` > 0: Mean-Teacher EMA teacher for the pseudo-targets; the
    validation metrics, plateau/early-stop signals, and the returned best
    state are then the EMA model's (the model FixMatch evaluates), while
    the per-epoch resume snapshot stays the student (training state). On
    resume the EMA average reseeds from the ``.best`` sidecar's params —
    which ARE EMA params — an approximation that re-converges within
    ~1/(1-d) steps.
    """
    import math
    from pathlib import Path

    from ssip_tpu.data.splits import balanced_epoch_indices
    from ssip_tpu.ops.metrics import accuracy_f1
    from ssip_tpu.runtime.prng import host_rng
    from ssip_tpu.train.engine import (
        _epoch_shardings,
        _mesh_row_width,
        _place_tree,
        get_lr,
        run_eval_epoch,
        set_lr,
    )

    fixmatch_epoch = make_fixmatch_epoch(
        consistency_weight, confidence_threshold, strong_aug=strong_aug,
        ema_decay=ema_decay,
    )
    use_ema = ema_decay > 0.0
    batch_sh = rep_sh = None
    row_width = None
    if mesh is not None:
        batch_sh, rep_sh = _epoch_shardings(mesh)
        row_width = _mesh_row_width(mesh, batch_size)
        unlabeled_batch_size = _mesh_row_width(mesh, unlabeled_batch_size)
        state = _place_tree(mesh, state, fsdp)
    # EMA average starts at the student (inherits mesh placement from it)
    ema_params = state.params if use_ema else None
    history = {
        "train_loss": [], "val_loss": [], "train_acc": [],
        "val_acc": [], "train_f1": [], "val_f1": [],
        "consistency_loss": [], "consistency_keep_rate": [],
    }
    best_state, best_val = state, math.inf
    early, plateau_best, plateau_bad = 0, math.inf, 0
    epoch_start = 0
    n_unlabeled = int(unlabeled_images.shape[0])

    if resume_path is not None and Path(resume_path).exists():
        from ssip_tpu.train.checkpoints import restore_resume_state

        state_r, driver, best_state_r = restore_resume_state(resume_path, state)
        if driver is not None:
            state, best_state = state_r, best_state_r
            if mesh is not None:
                state = _place_tree(mesh, state, fsdp)
            if use_ema:
                # .best params are EMA params (see docstring); reseed there
                ema_params = best_state.params
                if mesh is not None:
                    ema_params = _place_tree(mesh, best_state, fsdp).params
            history = driver["history"]
            best_val = driver["best_val_loss"]
            early = driver["early_patience"]
            plateau_best = driver["plateau_best"]
            plateau_bad = driver["plateau_bad"]
            epoch_start = driver["epoch"] + 1
            LOGGER.info(
                "Resumed '%s' from %s at epoch %d",
                stream_name, resume_path, epoch_start,
            )
            if driver.get("finished"):
                return best_state, history

    for epoch in range(epoch_start, num_epochs):
        order = balanced_epoch_indices(
            train_dataset.labels, seed=seed, epoch=epoch,
            num_samples=len(train_dataset),
        )
        pidx, valid = _stacked_epoch(order, batch_size, row_width)
        steps = pidx.shape[0]
        u_rng = host_rng(seed, f"{stream_name}/unlabeled/{epoch}")
        u_idx = u_rng.integers(0, n_unlabeled, size=(steps, unlabeled_batch_size))
        keys = jnp.stack(
            [epoch_key(seed, f"{stream_name}/aug/{epoch}", bi) for bi in range(steps)]
        )
        images = train_dataset.images_u8[jnp.asarray(pidx)]
        labels = train_dataset.labels_dev[jnp.asarray(pidx)]
        valid_dev = jnp.asarray(valid)
        unl = unlabeled_images[jnp.asarray(u_idx)]
        if mesh is not None:
            images = jax.device_put(images, batch_sh)
            labels = jax.device_put(labels, batch_sh)
            valid_dev = jax.device_put(valid_dev, batch_sh)
            unl = jax.device_put(unl, batch_sh)
            keys = jax.device_put(keys, rep_sh)
        if use_ema:
            (state, ema_params, losses, _sup, cons, keep, preds) = fixmatch_epoch(
                state, ema_params, images, labels, valid_dev, unl, keys,
            )
        else:
            state, losses, _sup, cons, keep, preds = fixmatch_epoch(
                state, images, labels, valid_dev, unl, keys,
            )
        train_loss = float(jnp.mean(losses))
        valid_flat = valid.reshape(-1)
        train_acc, train_f1 = accuracy_f1(
            train_dataset.labels[pidx.reshape(-1)[valid_flat]],
            np.asarray(preds).reshape(-1)[valid_flat],
        )
        # with an EMA teacher, validation (and hence plateau/early-stop/
        # best-state) follows the EMA model — the model FixMatch reports
        eval_state = state.replace(params=ema_params) if use_ema else state
        val_loss, vy, vp, _ = run_eval_epoch(
            eval_state, val_dataset, batch_size, mesh=mesh, fsdp=fsdp
        )
        val_acc, val_f1 = accuracy_f1(vy, vp)

        if val_loss < plateau_best * (1 - 1e-4):
            plateau_best, plateau_bad = val_loss, 0
        else:
            plateau_bad += 1
            if plateau_bad > plateau_patience:
                state = set_lr(state, get_lr(state) * plateau_factor)
                plateau_bad = 0

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        history["train_acc"].append(train_acc)
        history["val_acc"].append(val_acc)
        history["train_f1"].append(train_f1)
        history["val_f1"].append(val_f1)
        history["consistency_loss"].append(float(jnp.mean(cons)))
        history["consistency_keep_rate"].append(float(jnp.mean(keep)))
        LOGGER.info(
            "FixMatch epoch %d/%d - loss %.4f (cons %.4f, keep %.2f) | val loss %.4f acc %.3f",
            epoch + 1, num_epochs, train_loss, float(jnp.mean(cons)),
            float(jnp.mean(keep)), val_loss, val_acc,
        )

        stopped = False
        if val_loss < best_val:
            best_val, best_state, early = val_loss, eval_state, 0
            if resume_path is not None:
                from ssip_tpu.train.checkpoints import save_train_snapshot

                save_train_snapshot(
                    Path(str(resume_path) + ".best"), best_state, {"epoch": epoch}
                )
        else:
            early += 1
            if early >= early_stopping_patience:
                LOGGER.info("Early stopping triggered at epoch %d", epoch + 1)
                stopped = True

        if resume_path is not None:
            from ssip_tpu.train.checkpoints import save_train_snapshot

            save_train_snapshot(
                resume_path,
                state,
                {
                    "epoch": epoch,
                    "history": history,
                    "best_val_loss": best_val,
                    "early_patience": early,
                    "plateau_best": plateau_best,
                    "plateau_bad": plateau_bad,
                    "finished": stopped,
                },
            )
        if stopped:
            break
    return best_state, history

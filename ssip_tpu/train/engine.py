"""Jitted training/eval engine with the reference's epoch-driver semantics.

Functional re-design of the reference's torch loop (reference
src/training/common.py:345-432): the inner loop is one donated, jitted
``train_step`` (augment → forward(train) → CE loss → AdamW update, with BN
batch stats updated from the *global* batch — under jit over a data-sharded
batch XLA computes cross-device means, i.e. sync-BN for free); the outer
driver keeps the reference's control semantics exactly: per-epoch
train/val loss+acc+F1 history, ReduceLROnPlateau(factor 0.5, patience 2) on
val loss, early stopping (patience 3), best-val-loss state capture and
restore.

The whole (tiny) dataset lives device-resident as resized uint8; per-step
batches are device-side gathers — no host↔device traffic inside an epoch.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ssip_tpu.ops.augment import eval_preprocess, train_augment
from ssip_tpu.ops.metrics import accuracy_f1
from ssip_tpu.runtime.logging import get_logger
from ssip_tpu.runtime.prng import epoch_key

LOGGER = get_logger(__name__)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn, params, batch_stats, tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )


def make_optimizer(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    """AdamW with torch-default betas/eps and runtime-adjustable LR.

    ``inject_hyperparams`` exposes the learning rate in the optimizer state
    so the plateau scheduler can anneal it without recompiling the step.
    Decay applies to every parameter — torch.optim.AdamW's default, which is
    what the reference uses (reference supervised.py:115-119).
    """
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay,
    )


def get_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    """New TrainState with the LR replaced FUNCTIONALLY.

    In-place mutation of ``opt_state.hyperparams`` would retroactively change
    the LR of every state sharing that opt_state object (e.g. the captured
    best-val state) — PyTreeNodes must stay immutable.
    """
    opt_state = state.opt_state
    new_hyper = dict(opt_state.hyperparams)
    new_hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=new_hyper))


def _step_core(
    state: TrainState,
    images_u8: jax.Array,
    labels: jax.Array,
    valid: jax.Array,
    key: jax.Array,
    augment: bool,
    rotate_degrees: float,
    trainable_mask: Optional[Any],
):
    """One optimizer step (traceable; shared by per-step and fused-epoch jits)."""
    if augment:
        x = train_augment(images_u8, key, rotate_degrees)
    else:
        x = eval_preprocess(images_u8)

    def loss_fn(params):
        logits, new_model_state = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mask=valid, mutable=["batch_stats", "aux"],
        )
        weights = valid.astype(jnp.float32)
        per_example = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss = jnp.sum(per_example * weights) / jnp.maximum(jnp.sum(weights), 1.0)
        # auxiliary objectives sown by the model (MoE load-balance losses,
        # models/moe.py) — already coefficient-scaled at the sow site; dense
        # models sow nothing and the sum is empty
        for term in jax.tree.leaves(dict(new_model_state).get("aux", {})):
            loss = loss + jnp.sum(term)
        return loss, (logits, new_model_state)

    (loss, (logits, new_model_state)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    if trainable_mask is not None:
        grads = jax.tree.map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, trainable_mask
        )
    updates, new_opt_state = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    if trainable_mask is not None:
        # keep frozen params bit-identical (decay must not touch them)
        new_params = jax.tree.map(
            lambda new, old, m: new if m else old,
            new_params, state.params, trainable_mask,
        )
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        # stat-free models (ViT) mutate nothing under mutable=["batch_stats"]
        batch_stats=dict(new_model_state).get("batch_stats", state.batch_stats),
        opt_state=new_opt_state,
    )
    return new_state, loss, jnp.argmax(logits, axis=1)


def make_train_step(
    augment: bool = True,
    rotate_degrees: float = 10.0,
    trainable_mask: Optional[Any] = None,
):
    """Build the jitted single train step.

    ``trainable_mask``: pytree of bools matching params — False entries get
    zero gradient (the reference's requires_grad freezing of the backbone
    during weak pretrain, reference semi_supervised.py:261-263).
    """

    # NOTE: state is deliberately NOT donated — the epoch driver keeps the
    # best-val-loss state object alive across steps (donation would
    # invalidate its buffers). At ResNet-18 scale the extra copy is noise.
    @jax.jit
    def train_step(
        state: TrainState, images_u8: jax.Array, labels: jax.Array,
        valid: jax.Array, key: jax.Array,
    ):
        return _step_core(
            state, images_u8, labels, valid, key,
            augment, rotate_degrees, trainable_mask,
        )

    return train_step


def make_fused_epoch(
    augment: bool = True,
    rotate_degrees: float = 10.0,
    trainable_mask: Optional[Any] = None,
):
    """Build a whole-epoch jit: ``lax.scan`` over pre-gathered step batches.

    One dispatch runs every optimizer step of the epoch — the right shape
    for high-dispatch-latency links (remote TPU tunnels) and for letting XLA
    pipeline steps. Inputs are stacked [steps, batch, ...] device arrays.
    """

    @jax.jit
    def train_epoch(
        state: TrainState, images_u8: jax.Array, labels: jax.Array,
        valid: jax.Array, keys: jax.Array,
    ):
        def body(carry, xs):
            u8, lab, val, key = xs
            new_state, loss, preds = _step_core(
                carry, u8, lab, val, key, augment, rotate_degrees, trainable_mask
            )
            return new_state, (loss, preds)

        state, (losses, preds) = jax.lax.scan(
            body, state, (images_u8, labels, valid, keys)
        )
        return state, losses, preds

    return train_epoch


@partial(jax.jit, static_argnames="apply_fn")
def eval_step(apply_fn, params, batch_stats, images_u8, labels, valid):
    """Eval forward: normalize → frozen-stats forward → loss + preds + probs."""
    x = eval_preprocess(images_u8)
    logits = apply_fn({"params": params, "batch_stats": batch_stats}, x, train=False)
    weights = valid.astype(jnp.float32)
    per_example = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss = jnp.sum(per_example * weights) / jnp.maximum(jnp.sum(weights), 1.0)
    probs = jax.nn.softmax(logits, axis=1)
    preds = jnp.argmax(logits, axis=1)
    return loss, preds, probs


@partial(jax.jit, static_argnames="apply_fn")
def eval_epoch_fused(apply_fn, params, batch_stats, images_u8, labels, valid):
    """Whole-epoch eval in one dispatch: scan over [steps, batch, ...]."""

    def body(_, xs):
        u8, lab, val = xs
        loss, preds, probs = eval_step(apply_fn, params, batch_stats, u8, lab, val)
        return None, (loss, preds, probs)

    _, (losses, preds, probs) = jax.lax.scan(
        body, None, (images_u8, labels, valid)
    )
    return losses, preds, probs


@dataclass
class DeviceDataset:
    """Device-resident, eval-resized uint8 images + labels."""

    images_u8: jax.Array  # [N, S, S, 3]
    labels: np.ndarray  # [N] int64 (host copy for metrics/sampling)
    labels_dev: jax.Array  # [N] int32 on device

    @classmethod
    def create(cls, images_u8: jax.Array, labels: np.ndarray) -> "DeviceDataset":
        return cls(
            images_u8=images_u8,
            labels=np.asarray(labels, dtype=np.int64),
            labels_dev=jnp.asarray(np.asarray(labels), jnp.int32),
        )

    def __len__(self) -> int:
        return int(self.images_u8.shape[0])


def _batched_indices(n_or_indices, batch_size: int) -> List[np.ndarray]:
    idx = (
        np.arange(n_or_indices)
        if isinstance(n_or_indices, int)
        else np.asarray(n_or_indices)
    )
    return [idx[i : i + batch_size] for i in range(0, len(idx), batch_size)]


def _pad_batch(idx: np.ndarray, batch_size: int) -> Tuple[np.ndarray, np.ndarray]:
    valid = np.zeros(batch_size, dtype=bool)
    valid[: len(idx)] = True
    if len(idx) < batch_size:
        idx = np.concatenate([idx, np.zeros(batch_size - len(idx), idx.dtype)])
    return idx, valid


def _stacked_epoch(
    order: np.ndarray, batch_size: int, row_width: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """[steps, row] index + valid arrays (padding rows marked invalid).

    ``row_width`` (>= batch_size) pads every step's batch axis to a fixed
    width — used to round batches up to a multiple of the mesh data-axis
    size so the sharded batch divides evenly. Padding rows carry
    ``valid=False`` and are inert: masked out of the loss, of MaskedBatchNorm
    statistics, and of metrics.
    """
    order = np.asarray(order)
    row = row_width if row_width is not None else batch_size
    assert row >= batch_size
    steps = max(1, (len(order) + batch_size - 1) // batch_size)
    pidx = np.zeros((steps, row), order.dtype if order.size else np.int64)
    valid = np.zeros((steps, row), bool)
    for s in range(steps):
        chunk = order[s * batch_size : (s + 1) * batch_size]
        pidx[s, : len(chunk)] = chunk
        valid[s, : len(chunk)] = True
    return pidx, valid


def epoch_plan(
    train_dataset: "DeviceDataset",
    *,
    seed: int,
    epoch: int,
    stream_name: str,
    balanced: bool,
    batch_size: int,
    row_width: Optional[int] = None,
    pool: Optional[np.ndarray] = None,
    num_samples: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, jax.Array]:
    """One epoch's deterministic plan: (pidx [steps,row], valid, keys [steps]).

    The single source of the per-epoch sampling order and augmentation key
    streams. Both the solo driver (``train_model``) and the multi-seed
    driver (``train.multi_seed``) build their epochs through this function,
    so a multi-seed lane running seed ``s`` sees byte-identical batch orders
    and PRNG keys to a solo ``train_model(seed=s)`` run.

    ``pool``: restrict sampling to these dataset indices (cross-validation
    lanes train on their fold's subset of one shared device dataset); the
    returned pidx are global indices. ``num_samples``: override the epoch
    length (the CV fan-out pads every fold's epoch to the largest fold so
    lane step counts stay uniform under vmap).
    """
    labels = train_dataset.labels if pool is None else train_dataset.labels[pool]
    n = len(labels) if num_samples is None else int(num_samples)
    if balanced:
        from ssip_tpu.data.splits import balanced_epoch_indices

        order = balanced_epoch_indices(
            labels, seed=seed, epoch=epoch, num_samples=n,
        )
    else:
        from ssip_tpu.runtime.prng import host_rng

        # host_rng folds the stream name through sha256 — stable across
        # processes, unlike Python's per-process-salted hash()
        rng = host_rng(seed, f"shuffle/{stream_name}/{epoch}")
        order = rng.permutation(len(labels))
        if num_samples is not None:
            # truncate or cycle-pad to n so lane step counts stay uniform
            order = np.resize(order, n)
    if pool is not None:
        order = np.asarray(pool)[order]
    pidx, valid = _stacked_epoch(order, batch_size, row_width)
    keys = jnp.stack(
        [
            epoch_key(seed, f"{stream_name}/aug/{epoch}", bi)
            for bi in range(pidx.shape[0])
        ]
    )
    return pidx, valid, keys


def _epoch_shardings(mesh) -> Tuple[Any, Any]:
    """(stacked-batch sharding P(None, 'data'), replicated sharding P())."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssip_tpu.parallel.mesh import DATA_AXIS

    return (
        NamedSharding(mesh, P(None, DATA_AXIS)),
        NamedSharding(mesh, P()),
    )


def _place_tree(mesh, tree, fsdp: bool = False):
    """Place a param/state pytree on the mesh: replicated under pure DP,
    TP-sharded (wide conv O-axes / fc input axis over the model axis) when
    the mesh has a model dimension, and additionally ZeRO-3 sharded over
    the data axis with ``fsdp`` — rules in parallel.mesh.tree_shardings.
    """
    from ssip_tpu.parallel.mesh import tree_shardings

    return jax.device_put(tree, tree_shardings(mesh, tree, fsdp=fsdp))


def _mesh_row_width(mesh, batch_size: int) -> int:
    from ssip_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple

    return pad_to_multiple(batch_size, mesh.shape[DATA_AXIS])


def run_eval_epoch(
    state_or_vars, dataset: DeviceDataset, batch_size: int, apply_fn=None,
    mesh=None, fsdp: bool = False,
) -> Tuple[float, np.ndarray, np.ndarray, np.ndarray]:
    """(avg_loss, y_true, y_pred, y_prob_full[N, C]) over the dataset in order.

    The whole epoch runs as ONE fused dispatch (scan over batches); loss
    averaging matches the reference: mean of per-batch mean losses
    (reference common.py:317-342). With ``mesh``, each step's batch axis is
    sharded over the mesh's data axis (params replicated) — data-parallel
    eval with identical metrics at any device count.
    """
    if isinstance(state_or_vars, TrainState):
        apply_fn = state_or_vars.apply_fn
        params, batch_stats = state_or_vars.params, state_or_vars.batch_stats
    else:
        # stat-free models (ViT) have no batch_stats collection
        params = state_or_vars["params"]
        batch_stats = state_or_vars.get("batch_stats", {})

    n = len(dataset)
    row_width = _mesh_row_width(mesh, batch_size) if mesh is not None else None
    pidx, valid = _stacked_epoch(np.arange(n), batch_size, row_width)
    images = dataset.images_u8[jnp.asarray(pidx)]
    labels = dataset.labels_dev[jnp.asarray(pidx)]
    valid_dev = jnp.asarray(valid)
    if mesh is not None:
        batch_sh, rep_sh = _epoch_shardings(mesh)
        images = jax.device_put(images, batch_sh)
        labels = jax.device_put(labels, batch_sh)
        valid_dev = jax.device_put(valid_dev, batch_sh)
        params = _place_tree(mesh, params, fsdp)
        batch_stats = _place_tree(mesh, batch_stats, fsdp)
    losses, preds, probs = eval_epoch_fused(
        apply_fn, params, batch_stats, images, labels, valid_dev,
    )
    valid_flat = valid.reshape(-1)
    y_pred = np.asarray(preds).reshape(-1)[valid_flat]
    y_prob = np.asarray(probs).reshape(-1, probs.shape[-1])[valid_flat]
    avg_loss = float(jnp.mean(losses))
    return avg_loss, dataset.labels.copy(), y_pred, y_prob


def train_model(
    state: TrainState,
    train_dataset: DeviceDataset,
    val_dataset: DeviceDataset,
    *,
    num_epochs: int,
    batch_size: int,
    seed: int,
    stream_name: str,
    balanced: bool = True,
    augment: bool = True,
    early_stopping_patience: int = 3,
    plateau_patience: int = 2,
    plateau_factor: float = 0.5,
    trainable_mask: Optional[Any] = None,
    checkpoint_fn: Optional[Callable[[TrainState], None]] = None,
    resume_path: Optional[Any] = None,
    mesh=None,
    fsdp: bool = False,
) -> Tuple[TrainState, Dict[str, List[float]]]:
    """Epoch driver with reference-parity control flow (common.py:345-432).

    ``resume_path``: when set, a full snapshot (TrainState + driver state)
    is written there every epoch, and an existing snapshot restores the run
    mid-stream — preemption-safe training beyond the reference's
    final-artifact-only checkpoints.

    Known deviation, deliberate: this driver RETURNS the genuine
    best-val-loss state. The reference's in-memory restore is accidentally
    a no-op — ``best_state = model.state_dict()`` (common.py:420) aliases
    the live parameter tensors, so later epochs mutate the "saved" copy
    and the final ``load_state_dict(best_state)`` (:431) restores the
    final-epoch weights — while its on-disk ``.pt`` (torch.saved at
    improvement time, :424) holds the true best. We match the ARTIFACT
    (true best on disk AND in memory); post-training in-memory metrics can
    therefore differ from a reference run whenever validation degrades
    after the best epoch.

    ``mesh``: data-parallel training. Params/opt state are replicated over
    the mesh and each step's batch axis is sharded over the ``data`` axis —
    XLA inserts the gradient psum and computes BN statistics from the
    *global* batch (sync-BN), so the training trajectory matches the
    single-device run at any device count (reference semantics anchor:
    common.py:345-432 — same metrics from the same data).
    """
    from pathlib import Path

    train_epoch = make_fused_epoch(augment=augment, trainable_mask=trainable_mask)
    batch_sh = rep_sh = None
    row_width = None
    if mesh is not None:
        batch_sh, rep_sh = _epoch_shardings(mesh)
        row_width = _mesh_row_width(mesh, batch_size)
        state = _place_tree(mesh, state, fsdp)
    history: Dict[str, List[float]] = {
        "train_loss": [], "val_loss": [], "train_acc": [],
        "val_acc": [], "train_f1": [], "val_f1": [],
    }

    best_state = state
    best_val_loss = math.inf
    early_patience = 0
    plateau_best = math.inf
    plateau_bad = 0
    epoch_start = 0

    if resume_path is not None and Path(resume_path).exists():
        from ssip_tpu.train.checkpoints import restore_resume_state

        # An unreadable snapshot is treated as 'no snapshot' (warn and start
        # fresh) — a resume point must never be able to brick the run it
        # exists to protect. Atomic snapshot writes make this path
        # unreachable for SIGKILL truncation; it guards disk corruption and
        # format drift.
        state_r, driver, best_state_r = restore_resume_state(resume_path, state)
        if driver is not None:
            state, best_state = state_r, best_state_r
            if mesh is not None:
                state = _place_tree(mesh, state, fsdp)
            history = driver["history"]
            best_val_loss = driver["best_val_loss"]
            early_patience = driver["early_patience"]
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
        # whole epoch in one fused dispatch
        pidx, valid, keys = epoch_plan(
            train_dataset, seed=seed, epoch=epoch, stream_name=stream_name,
            balanced=balanced, batch_size=batch_size, row_width=row_width,
        )
        images = train_dataset.images_u8[jnp.asarray(pidx)]
        labels = train_dataset.labels_dev[jnp.asarray(pidx)]
        valid_dev = jnp.asarray(valid)
        if mesh is not None:
            images = jax.device_put(images, batch_sh)
            labels = jax.device_put(labels, batch_sh)
            valid_dev = jax.device_put(valid_dev, batch_sh)
            keys = jax.device_put(keys, rep_sh)
        state, losses, preds = train_epoch(
            state, images, labels, valid_dev, keys,
        )
        train_loss = float(jnp.mean(losses))
        valid_flat = valid.reshape(-1)
        y_true_cat = train_dataset.labels[pidx.reshape(-1)[valid_flat]]
        y_pred_cat = np.asarray(preds).reshape(-1)[valid_flat]
        train_acc, train_f1 = accuracy_f1(y_true_cat, y_pred_cat)

        val_loss, vy, vp, _ = run_eval_epoch(
            state, val_dataset, batch_size, mesh=mesh, fsdp=fsdp
        )
        val_acc, val_f1 = accuracy_f1(vy, vp)

        # ReduceLROnPlateau(mode=min, threshold_mode=rel 1e-4): improvement
        # means val_loss < best*(1-1e-4); >patience bad epochs → lr *= factor.
        if val_loss < plateau_best * (1 - 1e-4):
            plateau_best = val_loss
            plateau_bad = 0
        else:
            plateau_bad += 1
            if plateau_bad > plateau_patience:
                new_lr = get_lr(state) * plateau_factor
                LOGGER.info("Plateau: reducing lr to %.2e", new_lr)
                state = set_lr(state, new_lr)
                plateau_bad = 0

        history["train_loss"].append(train_loss)
        history["val_loss"].append(val_loss)
        history["train_acc"].append(train_acc)
        history["val_acc"].append(val_acc)
        history["train_f1"].append(train_f1)
        history["val_f1"].append(val_f1)

        LOGGER.info(
            "Epoch %d/%d - train loss %.4f acc %.3f f1 %.3f | val loss %.4f acc %.3f f1 %.3f",
            epoch + 1, num_epochs, train_loss, train_acc, train_f1,
            val_loss, val_acc, val_f1,
        )

        stopped = False
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            best_state = state
            early_patience = 0
            if checkpoint_fn is not None:
                checkpoint_fn(state)
            if resume_path is not None:
                from pathlib import Path as _P

                from ssip_tpu.train.checkpoints import save_train_snapshot

                save_train_snapshot(
                    _P(str(resume_path) + ".best"), best_state, {"epoch": epoch}
                )
        else:
            early_patience += 1
            if early_patience >= early_stopping_patience:
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
                    "best_val_loss": best_val_loss,
                    "early_patience": early_patience,
                    "plateau_best": plateau_best,
                    "plateau_bad": plateau_bad,
                    # early stop is terminal — resuming must not train more;
                    # normal completion leaves the run extendable
                    "finished": stopped,
                },
            )
        if stopped:
            break

    return best_state, history

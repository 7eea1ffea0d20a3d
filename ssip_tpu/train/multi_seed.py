"""Multi-seed parallel training: N independent models in one jitted program.

TPU-native capability with no reference counterpart (the reference trains a
single seed — reference src/training/common.py:345-432): in this corpus's
tiny-data regime (100 labeled images) one ResNet-18 step leaves a v5e chip
mostly idle, so independent training trials fan out across a leading SEED
axis instead. ``jax.vmap`` over (params, optimizer state, BN statistics,
PRNG key streams, sampling orders) turns N models' train steps into one
batched program, and sharding that axis over the mesh's ``data`` dimension
places one model per device — embarrassingly parallel, zero collectives on
the hot path.

Semantics contract: lane ``i`` reproduces what a solo
``train_model(seed=seeds[i])`` run would produce — same balanced-sampler
stream and augmentation keys (both built through ``engine.epoch_plan``),
same plateau-LR (rel-threshold 1e-4) and early-stopping control flow,
tracked per-lane on the host, and the same genuine best-val-loss state
returned per lane. Lanes that early-stop keep executing (a vmapped program
cannot retire one lane) but their history, best state, and LR freeze at the
stop epoch, so the wasted lanes are pure throughput, never semantics.

Not supported in this mode (use solo ``train_model``): mid-run resume
snapshots, per-improvement checkpoint callbacks, and tensor parallelism
(the mesh's data axis is repurposed for the seed axis).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.ops.metrics import accuracy_f1
from ssip_tpu.runtime.logging import get_logger
from ssip_tpu.train.engine import (
    DeviceDataset,
    TrainState,
    _stacked_epoch,
    _step_core,
    epoch_plan,
    eval_epoch_fused,
    eval_step,
)

LOGGER = get_logger(__name__)


def stack_states(states: Sequence[TrainState]) -> TrainState:
    """Stack N structurally-identical TrainStates along a new leading axis.

    The static fields (``tx``, ``apply_fn``) are taken from the first state;
    all lanes must share the optimizer/model *structure* (per-lane learning
    rates still diverge freely — the LR lives in ``opt_state.hyperparams``,
    which stacks into a per-lane vector).
    """
    first = states[0]

    def stk(get):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[get(s) for s in states])

    return first.replace(
        step=stk(lambda s: s.step),
        params=stk(lambda s: s.params),
        batch_stats=stk(lambda s: s.batch_stats),
        opt_state=stk(lambda s: s.opt_state),
    )


def index_state(stacked: TrainState, lane: int) -> TrainState:
    """Extract one lane's TrainState from a stacked multi-seed state."""
    take = lambda tree: jax.tree.map(lambda x: x[lane], tree)
    return stacked.replace(
        step=take(stacked.step),
        params=take(stacked.params),
        batch_stats=take(stacked.batch_stats),
        opt_state=take(stacked.opt_state),
    )


def get_lr_vector(stacked: TrainState) -> np.ndarray:
    return np.asarray(stacked.opt_state.hyperparams["learning_rate"], np.float32)


def set_lr_vector(stacked: TrainState, lrs: np.ndarray) -> TrainState:
    """Replace the per-lane learning-rate vector functionally."""
    opt_state = stacked.opt_state
    new_hyper = dict(opt_state.hyperparams)
    new_hyper["learning_rate"] = jnp.asarray(lrs, jnp.float32)
    return stacked.replace(opt_state=opt_state._replace(hyperparams=new_hyper))


def _select_lanes(
    improved: jax.Array, new: TrainState, old: TrainState
) -> TrainState:
    """Per-lane where(): lanes with improved=True take ``new``'s leaves."""

    def pick(n, o):
        mask = improved.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(mask, n, o)

    sel = lambda get: jax.tree.map(pick, get(new), get(old))
    return new.replace(
        step=sel(lambda s: s.step),
        params=sel(lambda s: s.params),
        batch_stats=sel(lambda s: s.batch_stats),
        opt_state=sel(lambda s: s.opt_state),
    )


def make_multi_epoch(
    augment: bool = True,
    rotate_degrees: float = 10.0,
    trainable_mask: Optional[Any] = None,
):
    """Whole-epoch jit over the seed axis: vmap(lane) ∘ scan(steps).

    Each lane gathers its own batches from the SHARED device-resident
    dataset inside the scan body (per-lane sampling orders differ), so HBM
    holds one copy of the images regardless of lane count.
    """

    def lane(state, images_full, labels_full, pidx, valid, keys):
        def body(carry, xs):
            idx, val, key = xs
            u8 = jnp.take(images_full, idx, axis=0)
            lab = jnp.take(labels_full, idx, axis=0)
            new_state, loss, preds = _step_core(
                carry, u8, lab, val, key, augment, rotate_degrees,
                trainable_mask,
            )
            return new_state, (loss, preds)

        state, (losses, preds) = jax.lax.scan(body, state, (pidx, valid, keys))
        return state, losses, preds

    @jax.jit
    def multi_epoch(states, images_full, labels_full, pidx, valid, keys):
        # states/pidx/keys carry the lane axis; dataset and the (identical
        # across lanes) validity masks broadcast.
        return jax.vmap(lane, in_axes=(0, None, None, 0, None, 0))(
            states, images_full, labels_full, pidx, valid, keys
        )

    return multi_epoch


@partial(jax.jit, static_argnames="apply_fn")
def eval_epoch_multi(apply_fn, params, batch_stats, images, labels, valid):
    """All lanes' eval epochs in one dispatch: vmap over stacked weights."""
    fn = lambda p, b: eval_epoch_fused(apply_fn, p, b, images, labels, valid)
    return jax.vmap(fn)(params, batch_stats)


@partial(jax.jit, static_argnames="apply_fn")
def eval_epoch_multi_gather(
    apply_fn, params, batch_stats, images_full, labels_full, vpidx, vvalid
):
    """Per-lane eval over PER-LANE index sets into one shared dataset.

    The cross-validation shape: each lane's validation fold differs, so the
    lane gathers its own batches from the shared device-resident images
    (``vpidx``/``vvalid`` are [lanes, steps, row]; fully-padded steps carry
    valid=False everywhere and are averaged out by the caller)."""

    def lane(p, b, pidx, valid):
        def body(_, xs):
            idx, val = xs
            u8 = jnp.take(images_full, idx, axis=0)
            lab = jnp.take(labels_full, idx, axis=0)
            return None, eval_step(apply_fn, p, b, u8, lab, val)

        _, out = jax.lax.scan(body, None, (pidx, valid))
        return out

    return jax.vmap(lane)(params, batch_stats, vpidx, vvalid)


def _lane_shardings(mesh, n_lanes: int):
    """(lane-sharded, replicated) NamedShardings, or (None, None) if the
    lane count doesn't divide the mesh's data axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ssip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    if mesh is None:
        return None, None
    if mesh.shape.get(MODEL_AXIS, 1) != 1:
        raise ValueError(
            "multi-seed training repurposes the mesh data axis for the seed "
            "fan-out; tensor parallelism (mesh model axis > 1) is not "
            "combinable with num_seeds > 1"
        )
    data_size = mesh.shape[DATA_AXIS]
    if n_lanes % data_size != 0:
        LOGGER.warning(
            "num_seeds=%d does not divide the mesh data axis (%d) — running "
            "the seed fan-out unsharded on the default device",
            n_lanes, data_size,
        )
        return None, None
    return (
        NamedSharding(mesh, P(DATA_AXIS)),
        NamedSharding(mesh, P()),
    )


class LaneControl:
    """Vectorized per-lane plateau / early-stop / best-val bookkeeping.

    Exactly ``train_model``'s scalar control flow (engine.py, itself
    matching reference src/training/common.py:345-432 +
    ReduceLROnPlateau(rel 1e-4)), applied lane-wise: stopped lanes are
    inert — their best, LR, and counters freeze. Pure host-side numpy, so
    the control semantics are testable against a scalar oracle with no
    device numerics in the way.
    """

    def __init__(
        self,
        n_lanes: int,
        *,
        early_stopping_patience: int = 3,
        plateau_patience: int = 2,
        plateau_factor: float = 0.5,
    ):
        self.early_stopping_patience = early_stopping_patience
        self.plateau_patience = plateau_patience
        self.plateau_factor = plateau_factor
        self.best_val = np.full(n_lanes, math.inf)
        self.early_pat = np.zeros(n_lanes, np.int64)
        self.plateau_best = np.full(n_lanes, math.inf)
        self.plateau_bad = np.zeros(n_lanes, np.int64)
        self.stopped = np.zeros(n_lanes, bool)

    def update(
        self, val_loss_vec: np.ndarray, lr_vec: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """One epoch's decisions: (improved, newly_stopped, new_lr_vec)."""
        active = ~self.stopped
        v = np.where(active, np.asarray(val_loss_vec, np.float64), math.inf)
        lr_vec = np.asarray(lr_vec, np.float32).copy()

        # ReduceLROnPlateau(mode=min, threshold_mode=rel 1e-4): improvement
        # means v < best*(1-1e-4); >patience bad epochs → lr *= factor.
        plateau_impr = active & (v < self.plateau_best * (1 - 1e-4))
        self.plateau_best = np.where(plateau_impr, v, self.plateau_best)
        self.plateau_bad = np.where(plateau_impr, 0, self.plateau_bad + active)
        cut = active & ~plateau_impr & (self.plateau_bad > self.plateau_patience)
        lr_vec[cut] *= self.plateau_factor
        self.plateau_bad[cut] = 0

        improved = active & (v < self.best_val)
        self.best_val = np.where(improved, v, self.best_val)
        self.early_pat = np.where(improved, 0, self.early_pat + active)
        newly_stopped = active & ~improved & (
            self.early_pat >= self.early_stopping_patience
        )
        self.stopped |= newly_stopped
        return improved, newly_stopped, lr_vec


def train_multi_seed(
    states: Sequence[TrainState],
    train_dataset: DeviceDataset,
    val_dataset: DeviceDataset,
    *,
    seeds: Sequence[int],
    num_epochs: int,
    batch_size: int,
    stream_name: str,
    balanced: bool = True,
    augment: bool = True,
    early_stopping_patience: int = 3,
    plateau_patience: int = 2,
    plateau_factor: float = 0.5,
    trainable_mask: Optional[Any] = None,
    mesh=None,
    lane_train_pools: Optional[Sequence[np.ndarray]] = None,
    lane_val_pools: Optional[Sequence[np.ndarray]] = None,
) -> Tuple[TrainState, List[Dict[str, List[float]]], List[Dict[str, Any]]]:
    """Train ``len(seeds)`` independent models simultaneously.

    Returns ``(best_states, histories, summary)`` where ``best_states`` is a
    lane-stacked TrainState holding each lane's best-val-loss weights
    (extract one with :func:`index_state`), ``histories`` is one
    reference-shaped history dict per lane (truncated at that lane's stop
    epoch), and ``summary`` is one row per lane (seed, best_val_loss,
    epochs_run, stopped_early, final_lr).

    ``lane_train_pools`` / ``lane_val_pools``: per-lane index sets into
    ``train_dataset`` — the cross-validation shape (one fold per lane, all
    folds trained simultaneously). Every lane's epoch is padded to the
    largest fold so step counts stay uniform under vmap; when set,
    ``val_dataset`` is ignored and validation gathers from
    ``train_dataset`` through each lane's own indices.

    Control-flow parity anchor: reference src/training/common.py:345-432 —
    identical plateau (rel 1e-4, factor/patience), early-stop, and
    best-state semantics as ``train_model``, vectorized over lanes.
    """
    n_lanes = len(states)
    assert n_lanes == len(seeds) and n_lanes >= 1
    assert lane_train_pools is None or len(lane_train_pools) == n_lanes
    assert (lane_val_pools is None) == (lane_train_pools is None), (
        "lane_train_pools and lane_val_pools come together (CV mode)"
    )
    if lane_val_pools is not None and any(len(p) == 0 for p in lane_val_pools):
        # an empty val fold would yield a NaN lane loss and garbage control
        # flow — fail loudly instead
        raise ValueError("every lane's validation pool must be non-empty")
    train_samples = (
        None
        if lane_train_pools is None
        else max(len(p) for p in lane_train_pools)
    )

    multi_epoch = make_multi_epoch(augment=augment, trainable_mask=trainable_mask)
    stacked = stack_states(states)
    lane_sh, rep_sh = _lane_shardings(mesh, n_lanes)
    images_full = train_dataset.images_u8
    labels_full = train_dataset.labels_dev
    if lane_val_pools is None:
        # pre-gather the (in-order, shared across lanes) eval epoch once
        vpidx, vvalid = _stacked_epoch(np.arange(len(val_dataset)), batch_size)
        vimages = val_dataset.images_u8[jnp.asarray(vpidx)]
        vlabels = val_dataset.labels_dev[jnp.asarray(vpidx)]
        vvalid_dev = jnp.asarray(vvalid)
    else:
        # per-lane val folds, padded to uniform step count with inert steps
        per = [_stacked_epoch(np.asarray(p), batch_size) for p in lane_val_pools]
        vsteps = max(x[0].shape[0] for x in per)
        vpidx = np.zeros((n_lanes, vsteps, batch_size), np.int64)
        vvalid = np.zeros((n_lanes, vsteps, batch_size), bool)
        for s, (pi, va) in enumerate(per):
            vpidx[s, : pi.shape[0]] = pi
            vvalid[s, : va.shape[0]] = va
        vpidx_dev = jnp.asarray(vpidx)
        vvalid_dev = jnp.asarray(vvalid)
    if lane_sh is not None:
        place = lambda sh: (lambda x: jax.device_put(x, sh))
        stacked = jax.tree.map(place(lane_sh), stacked)
        images_full = jax.device_put(images_full, rep_sh)
        labels_full = jax.device_put(labels_full, rep_sh)
        if lane_val_pools is None:
            vimages = jax.device_put(vimages, rep_sh)
            vlabels = jax.device_put(vlabels, rep_sh)
            vvalid_dev = jax.device_put(vvalid_dev, rep_sh)
        else:
            vpidx_dev = jax.device_put(vpidx_dev, lane_sh)
            vvalid_dev = jax.device_put(vvalid_dev, lane_sh)

    histories: List[Dict[str, List[float]]] = [
        {
            "train_loss": [], "val_loss": [], "train_acc": [],
            "val_acc": [], "train_f1": [], "val_f1": [],
        }
        for _ in range(n_lanes)
    ]
    best_states = stacked
    ctl = LaneControl(
        n_lanes,
        early_stopping_patience=early_stopping_patience,
        plateau_patience=plateau_patience,
        plateau_factor=plateau_factor,
    )

    for epoch in range(num_epochs):
        plans = [
            epoch_plan(
                train_dataset, seed=seeds[s], epoch=epoch,
                stream_name=stream_name, balanced=balanced,
                batch_size=batch_size,
                pool=None if lane_train_pools is None else lane_train_pools[s],
                num_samples=train_samples,
            )
            for s in range(n_lanes)
        ]
        pidx = np.stack([p[0] for p in plans])  # [S, steps, row]
        valid = plans[0][1]  # identical across lanes (same N, same batching)
        keys = jnp.stack([p[2] for p in plans])
        pidx_dev = jnp.asarray(pidx)
        valid_dev = jnp.asarray(valid)
        if lane_sh is not None:
            pidx_dev = jax.device_put(pidx_dev, lane_sh)
            keys = jax.device_put(keys, lane_sh)
            valid_dev = jax.device_put(valid_dev, rep_sh)

        stacked, losses, preds = multi_epoch(
            stacked, images_full, labels_full, pidx_dev, valid_dev, keys
        )
        if lane_val_pools is None:
            vlosses, vpreds, _vprobs = eval_epoch_multi(
                stacked.apply_fn, stacked.params, stacked.batch_stats,
                vimages, vlabels, vvalid_dev,
            )
        else:
            vlosses, vpreds, _vprobs = eval_epoch_multi_gather(
                stacked.apply_fn, stacked.params, stacked.batch_stats,
                images_full, labels_full, vpidx_dev, vvalid_dev,
            )

        losses = np.asarray(losses)
        preds = np.asarray(preds)
        vlosses = np.asarray(vlosses)
        vpreds = np.asarray(vpreds)
        valid_flat = valid.reshape(-1)

        was_active = ~ctl.stopped
        val_loss_vec = np.full(n_lanes, math.inf)
        for s in np.flatnonzero(was_active):
            if lane_val_pools is None:
                vvalid_s, vpidx_s = vvalid, vpidx
                val_loss_vec[s] = float(vlosses[s].mean())
                y_true_val = val_dataset.labels
            else:
                vvalid_s, vpidx_s = vvalid[s], vpidx[s]
                # mean of per-batch means over this lane's NON-EMPTY steps
                # (padded steps report loss 0 and must not dilute the mean)
                nonempty = vvalid_s.any(axis=1)
                val_loss_vec[s] = float(vlosses[s][nonempty].mean())
                y_true_val = train_dataset.labels[
                    vpidx_s.reshape(-1)[vvalid_s.reshape(-1)]
                ]
            vvalid_flat = vvalid_s.reshape(-1)
            y_true_cat = train_dataset.labels[pidx[s].reshape(-1)[valid_flat]]
            y_pred_cat = preds[s].reshape(-1)[valid_flat]
            train_acc, train_f1 = accuracy_f1(y_true_cat, y_pred_cat)
            y_pred_val = vpreds[s].reshape(-1)[vvalid_flat]
            val_acc, val_f1 = accuracy_f1(y_true_val, y_pred_val)
            h = histories[s]
            h["train_loss"].append(float(losses[s].mean()))
            h["val_loss"].append(val_loss_vec[s])
            h["train_acc"].append(train_acc)
            h["val_acc"].append(val_acc)
            h["train_f1"].append(train_f1)
            h["val_f1"].append(val_f1)

        lr_before = get_lr_vector(stacked)
        improved, newly_stopped, lr_after = ctl.update(val_loss_vec, lr_before)
        if not np.array_equal(lr_before, lr_after):
            for s in np.flatnonzero(lr_before != lr_after):
                LOGGER.info(
                    "Plateau (seed %d): reducing lr to %.2e",
                    seeds[s], lr_after[s],
                )
            stacked = set_lr_vector(stacked, lr_after)
        if improved.any():
            best_states = _select_lanes(
                jnp.asarray(improved), stacked, best_states
            )
        for s in np.flatnonzero(newly_stopped):
            LOGGER.info(
                "Early stopping (seed %d) at epoch %d", seeds[s], epoch + 1
            )

        LOGGER.info(
            "Epoch %d/%d [multi-seed] %s", epoch + 1, num_epochs,
            ", ".join(
                f"seed {seeds[s]}: val {val_loss_vec[s]:.4f}"
                for s in np.flatnonzero(was_active)
            ),
        )
        if ctl.stopped.all():
            break

    summary = [
        {
            "seed": int(seeds[s]),
            "best_val_loss": float(ctl.best_val[s]),
            "epochs_run": len(histories[s]["val_loss"]),
            "stopped_early": bool(ctl.stopped[s]),
            "final_lr": float(get_lr_vector(stacked)[s]),
        }
        for s in range(n_lanes)
    ]
    return best_states, histories, summary

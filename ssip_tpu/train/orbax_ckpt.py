"""Sharded train snapshots via orbax (SURVEY §5.4's "orbax-style" plan row).

The default snapshot backend (checkpoints.py:save_train_snapshot) is one
msgpack file written after a ``jax.device_get`` of the full TrainState —
correct and cheap on a single host, but the wrong shape for production
multi-host meshes, where pulling every shard of params + optimizer state
onto one host is O(model) network traffic and memory per epoch, and the
restored tree then has to be re-placed shard by shard.

This backend keeps the same snapshot API (state + driver dict, atomic
commit, one snapshot per training stream) but delegates to orbax:

- save: each shard is written by its owning process/device; the checkpoint
  directory is finalized with an atomic rename, so a preemption mid-write
  leaves the previous complete snapshot (same guarantee the msgpack
  backend's ``os.replace`` gives).
- restore: arrays are materialized directly INTO the template's shardings —
  no single-host gather, no re-placement pass.

Opt in with ``SSIP_SNAPSHOT_FORMAT=orbax`` (checkpoints.py dispatches); the
snapshot path then names a directory instead of a file. Loads auto-detect:
a directory restores through orbax regardless of the env var, so switching
formats between runs cannot orphan a resume point.

Reference anchor: the reference has final-artifact checkpoints only
(common.py:418-424); mid-run resume and its sharded variant are additive
TPU-scale machinery (SURVEY §5.3-5.4).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import jax

from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)


def _state_tree(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


def _restore_target(tree):
    """Abstract restore target carrying each template leaf's sharding.

    Concrete template leaves would also be accepted by orbax, but an
    abstract target makes the contract explicit: restore allocates arrays
    of this shape/dtype ON these shardings — the template's values are
    never read.
    """

    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x  # host scalars/ints restore as saved

    return jax.tree.map(leaf, tree)


def save_train_snapshot_orbax(path: Path, state, driver: Dict[str, Any]) -> None:
    """Write ``path`` as an orbax checkpoint directory (atomic finalize)."""
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        ckptr.save(
            path,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_state_tree(state)),
                driver=ocp.args.JsonSave(driver),
            ),
            force=True,
        )


def load_train_snapshot_orbax(path: Path, state_template) -> Tuple[Any, Dict[str, Any]]:
    """Restore (TrainState, driver) from an orbax snapshot directory.

    Arrays land directly in the template's shardings; raises on a missing
    or unreadable snapshot (callers treat that as 'no snapshot', matching
    the msgpack backend's contract).
    """
    import orbax.checkpoint as ocp

    path = Path(path).resolve()
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(
            path,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(
                    _restore_target(_state_tree(state_template))
                ),
                driver=ocp.args.JsonRestore(),
            ),
        )
    tree = restored["state"]
    state = state_template.replace(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )
    return state, dict(restored["driver"])

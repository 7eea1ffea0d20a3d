"""Checkpointing: torch-compatible artifacts + native Flax serialization.

The reference persists best-val-loss ``state_dict``s at
``outputs/models/{baseline,semi}_resnet18.pt`` (reference common.py:418-424,
:76-77). We keep that artifact contract — the ``.pt`` files written here are
genuine ``torch.load``-able torchvision-layout state_dicts (via the inverse
porting tool) so reference tooling keeps working — and additionally write a
``.msgpack`` Flax-native snapshot beside each for pure-JAX reload.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

from ssip_tpu.models.port_torch import export_state_dict, port_state_dict
from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)


def variables_of(state) -> Dict[str, Any]:
    return {"params": state.params, "batch_stats": state.batch_stats}


def save_checkpoint(path: Path, variables: Dict[str, Any]) -> None:
    """Write ``<path>`` (torch .pt state_dict) and ``<path>.msgpack``."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    host_vars = jax.device_get(variables)

    flax_path = path.with_suffix(path.suffix + ".msgpack")
    flax_path.write_bytes(serialization.to_bytes(host_vars))

    try:
        import torch

        state_dict = {
            k: torch.from_numpy(np.ascontiguousarray(v).copy())
            for k, v in export_state_dict(host_vars).items()
        }
        torch.save(state_dict, path)
    except Exception as exc:  # pragma: no cover - torch is present in CI
        LOGGER.warning("Skipping torch-format checkpoint %s: %s", path, exc)
    LOGGER.info("Saved checkpoint %s (+ .msgpack)", path)


def _state_tree(state) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }


_SNAPSHOT_MAGIC = b"SSIPSNAP1\n"


def save_train_snapshot(path: Path, state, driver: Dict[str, Any]) -> None:
    """Mid-run resume point: full TrainState (params, BN stats, optimizer
    state, step) + epoch-driver scalars/history, bundled in ONE file and
    committed with an atomic rename. A SIGKILL at any instant leaves either
    the previous complete snapshot or the new complete snapshot — never a
    truncated or state/driver-desynced pair (the preemption case resume
    exists for). One snapshot per training stream, overwritten every epoch.

    ``SSIP_SNAPSHOT_FORMAT=orbax`` routes to the sharded orbax backend
    (orbax_ckpt.py — per-shard writes, no single-host gather; the path
    becomes a directory) with the same atomic-commit guarantee.

    Layout (msgpack default): magic, 8-byte big-endian driver-JSON length,
    driver JSON, msgpack-serialized state tree.
    """
    import json
    import os

    if os.environ.get("SSIP_SNAPSHOT_FORMAT") == "orbax":
        from ssip_tpu.train.orbax_ckpt import save_train_snapshot_orbax

        save_train_snapshot_orbax(Path(path), state, driver)
        return

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    driver_bytes = json.dumps(driver).encode()
    payload = (
        _SNAPSHOT_MAGIC
        + len(driver_bytes).to_bytes(8, "big")
        + driver_bytes
        + serialization.to_bytes(jax.device_get(_state_tree(state)))
    )
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(payload)
    os.replace(tmp, path)


def load_train_snapshot(path: Path, state_template) -> tuple[Any, Dict[str, Any]]:
    """Restore (TrainState, driver dict) from a snapshot onto a template.

    Raises on a missing/corrupt snapshot — callers that resume
    opportunistically (train_model) treat that as 'no snapshot'. A snapshot
    that is a DIRECTORY restores through the sharded orbax backend
    regardless of ``SSIP_SNAPSHOT_FORMAT``, so switching formats between
    runs cannot orphan a resume point.
    """
    import json

    path = Path(path)
    if path.is_dir():
        from ssip_tpu.train.orbax_ckpt import load_train_snapshot_orbax

        return load_train_snapshot_orbax(path, state_template)
    raw = path.read_bytes()
    if raw.startswith(_SNAPSHOT_MAGIC):
        off = len(_SNAPSHOT_MAGIC)
        dlen = int.from_bytes(raw[off : off + 8], "big")
        driver = json.loads(raw[off + 8 : off + 8 + dlen].decode())
        state_bytes = raw[off + 8 + dlen :]
    else:  # legacy two-file layout (pre-atomic snapshots)
        driver = json.loads(
            path.with_suffix(path.suffix + ".driver.json").read_text()
        )
        state_bytes = raw
    tree = serialization.from_bytes(
        jax.device_get(_state_tree(state_template)), state_bytes
    )
    state = state_template.replace(
        step=tree["step"],
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
    )
    return state, driver


def load_checkpoint(path: Path, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load from the native msgpack if present, else port the torch .pt."""
    path = Path(path)
    flax_path = path.with_suffix(path.suffix + ".msgpack")
    if flax_path.exists():
        return serialization.from_bytes(jax.device_get(template), flax_path.read_bytes())
    if path.exists():
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
        return port_state_dict({k: v.numpy() for k, v in state.items()})
    raise FileNotFoundError(f"No checkpoint at {path} or {flax_path}")


def restore_resume_state(resume_path, state_template):
    """Shared resume-restore for the epoch drivers (engine.train_model,
    consistency.train_fixmatch): load the snapshot, then the ``.best``
    sidecar with its two failure modes (unreadable → warn, missing with a
    recorded historic best → warn that the current state stands in).

    Returns ``(state, driver, best_state)``; ``driver`` is ``None`` when the
    snapshot is unreadable (callers start fresh — a resume point must never
    brick the run it protects). Callers re-place trees on their mesh as
    needed (restored leaves are host arrays).
    """
    import math

    path = Path(resume_path)
    try:
        state, driver = load_train_snapshot(path, state_template)
    except Exception as exc:
        LOGGER.warning(
            "Unreadable resume snapshot %s (%s) — starting fresh", path, exc
        )
        return state_template, None, state_template

    best_path = Path(str(path) + ".best")
    best_state = state
    best_val = driver.get("best_val_loss", math.inf)
    if best_path.exists():
        try:
            best_state, _ = load_train_snapshot(best_path, state)
        except Exception as exc:
            LOGGER.warning(
                "Unreadable best-state snapshot %s (%s) — using current",
                best_path, exc,
            )
    elif math.isfinite(best_val):
        # An improvement was recorded but its state is gone: the run
        # continues with the CURRENT state standing in as "best" while the
        # historic best loss still gates improvements — the returned best
        # may not have achieved it. Surface that instead of proceeding
        # silently.
        LOGGER.warning(
            "Best-state snapshot %s missing (historic best %.4f) — current "
            "state stands in as best until the next improvement",
            best_path, best_val,
        )
    return state, driver, best_state

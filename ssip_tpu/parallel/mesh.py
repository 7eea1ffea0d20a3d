"""Mesh bootstrap + sharding utilities.

The reference is single-device (reference: src/training/common.py:55 — a lone
``torch.device``); parallelism here is new TPU-native capability. The design
is the standard JAX recipe: build one ``jax.sharding.Mesh`` with a ``data``
axis (batch/data parallelism — gradients reduced by XLA-inserted collectives
over ICI) and a ``model`` axis (optional tensor parallelism for wide layers),
annotate arrays with ``NamedSharding``, and let ``jit`` partition the program.

Nothing in this module talks to a specific backend: on TPU the axes map to
real chips over ICI; in tests the same code runs on a virtual 8-device CPU
mesh (``xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data * model`` must equal the device count used."""

    data: int
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


def build_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ``(data, model)`` mesh.

    Defaults to all available devices on the data axis (pure DP) — the right
    default for ResNet-18 scale models where the weights fit comfortably in
    one chip's HBM and the batch axis is the only profitable sharding.
    """
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(data=len(devices), model=1)
    if spec.num_devices > len(devices):
        raise ValueError(
            f"MeshSpec {spec} needs {spec.num_devices} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[: spec.num_devices]).reshape(spec.data, spec.model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def training_mesh(data: Optional[int] = None, model: int = 1) -> Mesh:
    """Data-parallel training mesh over ``data`` devices (default: all).

    The default makes every training/eval epoch data-parallel out of the
    box: on one chip it degenerates to the single-device program; on a pod
    slice the batch axis shards over ICI with XLA-inserted gradient psums.
    """
    devices = jax.devices()
    n = int(data) if data is not None else max(1, len(devices) // max(1, model))
    return build_mesh(MeshSpec(data=n, model=model), devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis; replicate rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_param_spec(path, leaf, model_par: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter/optimizer leaf.

    The rules that ``__graft_entry__.dryrun_multichip`` validates on every
    driver run: wide conv kernels (HWIO) shard their output-channel axis
    over the model axis; the classifier ``fc`` matrix shards its input
    axis (so the preceding feature gather stays local and XLA inserts one
    psum over the logits); everything else — stems, narrow convs, BN
    affine/stats, biases — replicates. Shape-based so the same rule covers
    optimizer moments (mu/nu mirror parameter shapes and paths).
    """
    names = [str(getattr(p, "key", p)) for p in path]
    if (
        getattr(leaf, "ndim", 0) == 4
        and leaf.shape[-1] % model_par == 0
        and leaf.shape[-1] >= 128
    ):
        return P(None, None, None, MODEL_AXIS)
    if (
        names[-2:] == ["fc", "kernel"]
        and getattr(leaf, "ndim", 0) == 2
        and leaf.shape[0] % model_par == 0
    ):
        return P(MODEL_AXIS, None)
    # ViT encoder blocks, Megatron-style: the qkv and first-MLP projections
    # are column-parallel (output axis sharded — heads/neurons split across
    # devices, attention and GELU stay local), their successors out/mlp_2
    # are row-parallel (input axis sharded), so XLA inserts exactly one
    # psum per attention and one per MLP.
    if names[-1] == "kernel" and getattr(leaf, "ndim", 0) == 2:
        mod = names[-2]
        if mod in ("qkv", "mlp_1") and leaf.shape[1] % model_par == 0:
            return P(None, MODEL_AXIS)
        if mod in ("out", "mlp_2") and leaf.shape[0] % model_par == 0:
            return P(MODEL_AXIS, None)
    if (
        names[-1] == "bias"
        and getattr(leaf, "ndim", 0) == 1
        and names[-2] in ("qkv", "mlp_1")
        and leaf.shape[0] % model_par == 0
    ):
        return P(MODEL_AXIS)  # biases follow their column-parallel kernels
    # Expert parallelism (models/moe.py): every expert parameter carries a
    # leading [E] axis — shard it over the model axis so each device holds
    # E/model_par experts and XLA lowers the one-hot dispatch/return einsums
    # to the token all-to-all. The f32 router stays replicated (it is tiny
    # and every device needs every routing decision).
    if (
        "moe" in names
        and names[-1] in ("w_in", "w_out", "b_in", "b_out")
        and getattr(leaf, "ndim", 0) >= 2
        and leaf.shape[0] % model_par == 0
    ):
        return P(MODEL_AXIS)  # leading axis sharded, rest replicated
    return P()


# Leaves below this many elements replicate under FSDP: sharding tiny
# tensors buys no memory and costs an all-gather dispatch + lane-padding
# waste on the (8,128) TPU tile grid.
FSDP_MIN_ELEMENTS = 65536


def fsdp_param_spec(path, leaf, data_par: int, model_par: int) -> P:
    """ZeRO-3-style spec: TP rules first, then shard the largest remaining
    axis of every big leaf over the DATA axis.

    Parameters and optimizer moments live sharded across the data-parallel
    devices (each holds 1/data_par); inside the jitted step XLA all-gathers
    a parameter just before its matmul and reduce-scatters its gradient —
    the standard JAX FSDP recipe (annotation only, no manual collectives).
    Composes with tensor parallelism: a TP-sharded kernel gets the data
    axis on its largest still-unsharded dimension (2-D sharding).
    """
    spec = list(
        tp_param_spec(path, leaf, model_par)
        if model_par > 1
        else (None,) * getattr(leaf, "ndim", 0)
    )
    ndim = getattr(leaf, "ndim", 0)
    spec += [None] * (ndim - len(spec))
    if getattr(leaf, "size", 0) >= FSDP_MIN_ELEMENTS and ndim > 0:
        candidates = [
            d for d in range(ndim)
            if spec[d] is None and leaf.shape[d] % data_par == 0
        ]
        if candidates:
            best = max(candidates, key=lambda d: leaf.shape[d])
            spec[best] = DATA_AXIS
    while spec and spec[-1] is None:  # canonical form: P() not P(None,...)
        spec.pop()
    return P(*spec)


def tree_shardings(mesh: Mesh, tree, fsdp: bool = False):
    """Per-leaf NamedShardings for a param/state pytree on this mesh.

    With ``model == 1`` and ``fsdp=False`` every leaf replicates (pure DP —
    the fast path the engine used before TP became reachable); with
    ``model > 1`` the ``tp_param_spec`` rules apply leafwise; ``fsdp=True``
    additionally shards every big leaf over the data axis
    (``fsdp_param_spec``) so parameter + optimizer memory scales 1/N.
    """
    import jax.tree_util as jtu

    model_par = int(mesh.shape.get(MODEL_AXIS, 1))
    data_par = int(mesh.shape.get(DATA_AXIS, 1))
    if fsdp and data_par > 1:
        return jtu.tree_map_with_path(
            lambda path, leaf: NamedSharding(
                mesh, fsdp_param_spec(path, leaf, data_par, model_par)
            ),
            tree,
        )
    if model_par <= 1:
        return jtu.tree_map(lambda _: NamedSharding(mesh, P()), tree)
    return jtu.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, tp_param_spec(path, leaf, model_par)),
        tree,
    )


def pad_to_multiple(n: int, multiple: int) -> int:
    """Smallest padded size >= n divisible by ``multiple``."""
    if multiple <= 0:
        raise ValueError("multiple must be positive")
    return ((n + multiple - 1) // multiple) * multiple


def shard_batch(
    mesh: Mesh, array: np.ndarray, pad_value: float | int = 0
) -> tuple[jax.Array, int]:
    """Device-put a host batch sharded over the data axis.

    Pads the leading axis up to a multiple of the data-axis size (static
    shapes keep XLA happy; callers mask out the padding) and returns
    ``(sharded_array, original_length)``.
    """
    data_size = mesh.shape[DATA_AXIS]
    n = array.shape[0]
    padded = pad_to_multiple(max(n, 1), data_size)
    if padded != n:
        pad_width = [(0, padded - n)] + [(0, 0)] * (array.ndim - 1)
        array = np.pad(array, pad_width, constant_values=pad_value)
    return jax.device_put(array, batch_sharding(mesh)), n

"""Training-side dataset assembly: device-resident resized tensors.

The reference streams PIL→transform per item through DataLoader workers
every epoch (reference common.py:126-194, 249-292). TPU-native re-design:
the deterministic prefix of the transform (decode → RGB convert →
Resize(S,S)) runs ONCE — decode on host, resize on device in one batched
shot — leaving a [N, S, S, 3] uint8 tensor resident in HBM. Per-step work is
then a pure device gather + random augment inside the jitted train step.
For this corpus (1506 × 224² × 3 ≈ 226 MB) residency is trivially cheap.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.data.decode import decode_batch
from ssip_tpu.data.discovery import labeled_folder, unlabeled_files
from ssip_tpu.ops.resize import resize_bilinear
from ssip_tpu.runtime.logging import get_logger
from ssip_tpu.train.engine import DeviceDataset

LOGGER = get_logger(__name__)


def _resize_on_device(
    arrays: List[np.ndarray], image_size: int, batch: int = 256
) -> jax.Array:
    """Resize a list of decoded u8 images to [N, S, S, 3] u8 on device.

    Uniform-shape images are resized in device batches (MXU matmuls);
    stragglers go one-by-one. Output stays on the default device.
    """
    from collections import defaultdict

    by_shape: dict[tuple, list[int]] = defaultdict(list)
    for i, arr in enumerate(arrays):
        by_shape[arr.shape].append(i)

    resize_jit = jax.jit(
        lambda x: jnp.round(
            resize_bilinear(x, image_size, image_size, quantize=True)
        ).astype(jnp.uint8),
    )
    # Assemble with ONE device concatenate + ONE order-restoring take —
    # an out.at[idx].set per chunk copies the whole [N, S, S, 3] device
    # buffer once per chunk and per unique input shape (review r3). Host
    # assembly would be worse here: it pays a D2H per chunk over the
    # tunnel; this keeps resized pixels on device.
    chunks: List[jax.Array] = []
    order: List[int] = []
    for shape, idxs in by_shape.items():
        for start in range(0, len(idxs), batch):
            chunk = idxs[start : start + batch]
            stacked = np.stack([arrays[i] for i in chunk])
            chunks.append(resize_jit(jnp.asarray(stacked)))
            order.extend(chunk)
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    if order != sorted(order):
        inv = np.empty(len(order), np.int64)
        inv[np.asarray(order)] = np.arange(len(order))
        out = jnp.take(out, jnp.asarray(inv), axis=0)
    return out


def load_labeled_dataset(
    strong_data_dir: Path, image_size: int, num_threads: int = 4
) -> Tuple[jax.Array, np.ndarray, List[str], List[Path]]:
    """(resized u8 images, targets, classes, paths) — ImageFolder semantics.

    Training channel policy: ``.convert("RGB")`` (reference common.py:171).
    Decode failures are fatal here (labeled data must be intact), matching
    ImageFolder behavior.
    """
    paths, targets, classes = labeled_folder(strong_data_dir)
    arrays, failures = decode_batch(paths, convert_rgb=True, num_threads=num_threads)
    if failures:
        raise RuntimeError(f"Failed to decode labeled images: {failures}")
    images = _resize_on_device([a for a in arrays], image_size)
    return images, np.asarray(targets), classes, paths


def load_unlabeled_dataset(
    weak_data_dir: Path,
    image_size: int,
    keep_paths: Optional[Sequence[Path]] = None,
    num_threads: int = 4,
) -> Tuple[jax.Array, List[Path]]:
    """(resized u8 images, paths) for the flat unlabeled pool.

    ``keep_paths`` applies a cohort filter (reference semi_supervised.py:
    191-228) before decode. Decode failures are dropped with a warning.
    """
    paths = unlabeled_files(weak_data_dir)
    if keep_paths is not None:
        keep = {str(Path(p).resolve()) for p in keep_paths}
        paths = [p for p in paths if str(p.resolve()) in keep]
    if not paths:
        raise RuntimeError(f"No unlabeled images to load from {weak_data_dir}")
    arrays, failures = decode_batch(paths, convert_rgb=True, num_threads=num_threads)
    kept = [(p, a) for p, a in zip(paths, arrays) if a is not None]
    if failures:
        LOGGER.warning("Dropped %d undecodable unlabeled images", len(failures))
    if not kept:
        raise RuntimeError("All unlabeled images failed to decode")
    images = _resize_on_device([a for _, a in kept], image_size)
    return images, [p for p, _ in kept]


def subset(images: jax.Array, labels: np.ndarray, indices: np.ndarray) -> DeviceDataset:
    idx = jnp.asarray(np.asarray(indices))
    return DeviceDataset.create(images[idx], np.asarray(labels)[np.asarray(indices)])

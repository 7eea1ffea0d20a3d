"""Device input pipeline: decode-once store + double-buffered host→HBM feed.

The reference overlaps decode with compute via DataLoader worker processes
(reference common.py:270-290). The TPU-native equivalent: decode each image
once into a packed uint8 store (optionally disk-cached, keyed by the dataset
digest), then stream fixed-shape batches to the device with a background
stager thread so the host→HBM copy of batch *i+1* overlaps the device compute
of batch *i*. Static batch shapes (last batch padded, valid count carried)
keep one compiled executable for the whole stream.
"""

from __future__ import annotations

import json
import queue
import threading
from pathlib import Path
from typing import Iterator, List, NamedTuple, Optional, Sequence

import jax
import numpy as np

from ssip_tpu.data.decode import decode_batch
from ssip_tpu.runtime.logging import get_logger

LOGGER = get_logger(__name__)


class ImageStore:
    """Packed uint8 [N, H, W, 3] image store with odd-size fallback list.

    Images matching the majority shape live in one contiguous array (cheap
    slicing, memmap-able); stragglers are kept individually and looked up by
    index. Decode failures are recorded, not fatal (reference
    feature_extraction.py:276-284).
    """

    def __init__(
        self,
        packed: np.ndarray,
        packed_index: np.ndarray,
        extras: dict[int, np.ndarray],
        failures: List[Path],
        paths: List[Path],
    ) -> None:
        self.packed = packed
        self._packed_index = packed_index  # row in `packed` for each dataset idx, -1 if extra/failed
        self._extras = extras
        self.failures = failures
        self.paths = paths

    @classmethod
    def from_paths(
        cls,
        paths: Sequence[Path],
        convert_rgb: bool = False,
        num_threads: int = 8,
        cache_dir: Optional[Path] = None,
        cache_key: Optional[str] = None,
    ) -> "ImageStore":
        paths = [Path(p) for p in paths]
        if cache_dir is not None and cache_key is not None:
            cached = cls._load_cache(cache_dir, cache_key, paths)
            if cached is not None:
                return cached

        arrays, failures = decode_batch(paths, convert_rgb=convert_rgb, num_threads=num_threads)
        shapes = [a.shape for a in arrays if a is not None]
        if not shapes:
            raise RuntimeError("All images failed to decode")
        # majority shape gets the packed fast path
        from collections import Counter

        major_shape = Counter(shapes).most_common(1)[0][0]
        n_major = sum(1 for s in shapes if s == major_shape)
        packed = np.empty((n_major, *major_shape), dtype=np.uint8)
        packed_index = np.full(len(paths), -1, dtype=np.int64)
        extras: dict[int, np.ndarray] = {}
        row = 0
        for i, arr in enumerate(arrays):
            if arr is None:
                continue
            if arr.shape == major_shape:
                packed[row] = arr
                packed_index[i] = row
                row += 1
            else:
                extras[i] = arr
        store = cls(packed, packed_index, extras, failures, paths)
        if cache_dir is not None and cache_key is not None and not extras and not failures:
            store._save_cache(cache_dir, cache_key)
        return store

    # -- cache ------------------------------------------------------------
    @staticmethod
    def _cache_paths(cache_dir: Path, key: str) -> tuple[Path, Path]:
        return cache_dir / f"raw_{key}.u8.npy", cache_dir / f"raw_{key}.meta.json"

    def _save_cache(self, cache_dir: Path, key: str) -> None:
        cache_dir.mkdir(parents=True, exist_ok=True)
        data_path, meta_path = self._cache_paths(cache_dir, key)
        np.save(data_path, self.packed)
        meta = {
            "paths": [str(p) for p in self.paths],
            "packed_index": self._packed_index.tolist(),
            "shape": list(self.packed.shape),
        }
        meta_path.write_text(json.dumps(meta))
        LOGGER.info("Cached decoded images to %s (%.1f MB)", data_path, self.packed.nbytes / 1e6)

    @classmethod
    def _load_cache(
        cls, cache_dir: Path, key: str, paths: List[Path]
    ) -> Optional["ImageStore"]:
        data_path, meta_path = cls._cache_paths(cache_dir, key)
        if not (data_path.exists() and meta_path.exists()):
            return None
        try:
            meta = json.loads(meta_path.read_text())
            if meta["paths"] != [str(p) for p in paths]:
                return None
            packed = np.load(data_path, mmap_mode="r")
            LOGGER.info("Loaded decoded-image cache %s", data_path)
            return cls(packed, np.asarray(meta["packed_index"]), {}, [], paths)
        except Exception as exc:  # pragma: no cover - corrupt cache tolerated
            LOGGER.warning("Ignoring unreadable cache %s: %s", data_path, exc)
            return None

    # -- access -----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.paths)

    @property
    def image_shape(self) -> tuple[int, ...]:
        return tuple(self.packed.shape[1:])

    def valid_indices(self) -> np.ndarray:
        """Dataset indices that decoded successfully."""
        ok = self._packed_index >= 0
        for i in self._extras:
            ok[i] = True
        return np.nonzero(ok)[0]

    def get(self, index: int) -> np.ndarray:
        row = self._packed_index[index]
        if row >= 0:
            return self.packed[row]
        if index in self._extras:
            return self._extras[index]
        raise KeyError(f"Image {index} ({self.paths[index]}) failed to decode")

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        """[len(indices), H, W, 3] batch (odd-size extras resized via PIL).

        Fast path: a full in-order gather over a fully-packed store returns
        the packed array itself (possibly a disk memmap) — ``device_put``
        then streams straight from it with no intermediate host copy.
        """
        from PIL import Image

        indices_arr = np.asarray(indices)
        if (
            not self._extras
            and len(indices_arr) == len(self.paths)
            and np.array_equal(self._packed_index[indices_arr], np.arange(len(self.paths)))
        ):
            return self.packed

        h, w, c = self.image_shape
        out = np.empty((len(indices_arr), h, w, c), dtype=np.uint8)
        rows = self._packed_index[indices_arr]
        packed_mask = rows >= 0
        out[packed_mask] = self.packed[rows[packed_mask]]
        for pos in np.nonzero(~packed_mask)[0]:
            arr = self.get(int(indices_arr[pos]))
            if arr.shape != (h, w, c):
                arr = np.asarray(
                    Image.fromarray(arr).resize((w, h), Image.BILINEAR)
                )
                if arr.ndim == 2:
                    arr = np.stack([arr] * 3, axis=-1)
            out[pos] = arr
        return out


class Batch(NamedTuple):
    data: jax.Array  # [batch, ...] on device, padded
    indices: np.ndarray  # dataset indices for valid rows
    valid: int  # number of valid rows (rest is padding)


def iter_streamed_decode_batches(
    paths: Sequence[Path],
    batch_size: int,
    image_shape: tuple[int, int, int],
    convert_rgb: bool = False,
    num_threads: int = 4,
    fast_scale: Optional[int] = None,
    host_resize: Optional[int] = None,
    host_crop: Optional[int] = None,
    sharding: Optional[jax.sharding.Sharding] = None,
    prefetch: int = 2,
    failures: Optional[List[Path]] = None,
) -> Iterator[Batch]:
    """Constant-host-memory stream: decode → H2D → compute, all overlapped.

    Unlike the decode-once ``ImageStore`` (which holds the whole decoded
    corpus in host RAM before any device work starts), this pipeline decodes
    one batch at a time in a background thread while a second thread
    transfers the previous batch to the device and the caller computes on
    the one before that — a 3-stage pipeline whose throughput is the max of
    (decode, H2D, compute) instead of their sum, in O(batch) host memory.
    This is the e2e shape for corpora that don't fit host RAM (the
    reference's 4M-image aspiration, docs/presentation.md:151-158).

    Rows that fail to decode are dropped (appended to ``failures`` if
    given); odd-shaped rows are PIL-resized to ``image_shape`` like
    ``ImageStore.gather``. Valid rows are compacted to the front of each
    fixed-shape batch and ``Batch.indices`` names them.

    Host-preprocessing knobs: ``fast_scale`` decodes via DCT-domain scaling
    (libjpeg scale_denom / PIL draft, ~3× faster, approximate — parity-mode
    callers leave it off). ``host_resize`` + ``host_crop`` must be set
    TOGETHER (setting only one is ignored by ``decode_batch``): they run
    the EXACT torchvision-semantics short-side-resize + center-crop chain
    (``preprocess_host_exact``, bitwise what the device computes) inside
    the decode workers, so only the network's crop ever crosses the
    host→device link (224²×3 uint8 is 5.3× fewer bytes than 512²×3 —
    decisive when the link, not the chip, bounds e2e throughput).
    """
    from PIL import Image

    paths = [Path(p) for p in paths]
    n = len(paths)
    if n == 0:
        return
    h, w, c = image_shape
    num_batches = (n + batch_size - 1) // batch_size

    host_q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
    dev_q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()

    def decode_stage() -> None:
        try:
            for bi in range(num_batches):
                if stop.is_set():
                    return
                lo = bi * batch_size
                batch_paths = paths[lo : lo + batch_size]
                # host_resize/host_crop: the exact short-side-resize +
                # center-crop chain (torchvision semantics, int-truncated
                # long side) runs INSIDE decode_batch's workers — native
                # fused kernel when built — so the single decode-stage
                # thread never pays per-image Python/PIL work
                # (data/decode.py:preprocess_host_exact).
                arrays, failed = decode_batch(
                    batch_paths,
                    convert_rgb=convert_rgb,
                    num_threads=num_threads,
                    fast_scale=fast_scale,
                    host_resize=host_resize,
                    host_crop=host_crop,
                )
                if failed and failures is not None:
                    failures.extend(failed)
                out = np.zeros((batch_size, h, w, c), dtype=np.uint8)
                kept: list[int] = []
                for j, arr in enumerate(arrays):
                    if arr is None:
                        continue
                    if arr.shape != (h, w, c):
                        # decode_image already stacks grayscale to 3ch;
                        # this is the same odd-shape normalization
                        # ImageStore.gather applies
                        arr = np.asarray(
                            Image.fromarray(arr).resize((w, h), Image.BILINEAR)
                        )
                    out[len(kept)] = arr
                    kept.append(lo + j)
                if kept:
                    host_q.put((out, np.asarray(kept, dtype=np.int64)))
            host_q.put(None)
        except BaseException as exc:  # propagate to consumer
            host_q.put(exc)

    def transfer_stage() -> None:
        try:
            while True:
                item = host_q.get()
                if item is None or isinstance(item, BaseException):
                    dev_q.put(item)
                    return
                if stop.is_set():
                    return
                arr, kept = item
                dev = (
                    jax.device_put(arr, sharding)
                    if sharding is not None
                    else jax.device_put(arr)
                )
                dev_q.put(Batch(dev, kept, len(kept)))
        except BaseException as exc:
            dev_q.put(exc)

    threads = [
        threading.Thread(target=decode_stage, daemon=True, name="ssip-decode"),
        threading.Thread(target=transfer_stage, daemon=True, name="ssip-h2d"),
    ]
    for t in threads:
        t.start()
    try:
        while True:
            item = dev_q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # Unblock producers stuck in put() (they re-check `stop` after) and
        # the transfer stage stuck in get(); repeat until both exit.
        for _ in range(2 * (num_batches + prefetch) + 4):
            if not any(t.is_alive() for t in threads):
                break
            for q_ in (host_q, dev_q):
                try:
                    q_.get_nowait()
                except queue.Empty:
                    pass
            try:
                host_q.put_nowait(None)
            except queue.Full:
                pass
            for t in threads:
                t.join(timeout=0.05)


def iter_device_batches(
    store: ImageStore,
    indices: Sequence[int],
    batch_size: int,
    sharding: Optional[jax.sharding.Sharding] = None,
    prefetch: int = 2,
) -> Iterator[Batch]:
    """Double-buffered batch stream: stage → device_put → yield.

    A background thread gathers + transfers the next ``prefetch`` batches
    while the caller computes on the current one, hiding host→HBM latency.
    The final partial batch is zero-padded to the fixed batch shape.
    """
    indices = np.asarray(indices)
    n = len(indices)
    if n == 0:
        return
    num_batches = (n + batch_size - 1) // batch_size

    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))
    stop = threading.Event()

    def stage() -> None:
        try:
            for bi in range(num_batches):
                if stop.is_set():
                    return
                batch_idx = indices[bi * batch_size : (bi + 1) * batch_size]
                arr = store.gather(batch_idx)
                valid = len(batch_idx)
                if valid < batch_size:
                    pad = np.zeros((batch_size - valid, *arr.shape[1:]), arr.dtype)
                    arr = np.concatenate([arr, pad], axis=0)
                dev = (
                    jax.device_put(arr, sharding)
                    if sharding is not None
                    else jax.device_put(arr)
                )
                q.put(Batch(dev, batch_idx, valid))
            q.put(None)
        except BaseException as exc:  # propagate to consumer
            q.put(exc)

    thread = threading.Thread(target=stage, daemon=True, name="ssip-feeder")
    thread.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        # drain so the stager can exit
        while thread.is_alive():
            try:
                q.get_nowait()
            except queue.Empty:
                break
        thread.join(timeout=5)

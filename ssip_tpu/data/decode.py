"""Host JPEG decode: PIL path, native C++ path, threaded batch decode.

Channel policy is workload-dependent and intentional (reference
docs/feature_extraction.md): the extraction chain does **no** RGB conversion
(feature_extraction.py:233-240) while the training datasets convert to RGB
(common.py:171, 191). The corpus is RGB JPEG throughout, so both policies
decode to [H, W, 3]; ``convert_rgb`` exists for odd inputs.

On this class of host the decoder is the end-to-end bottleneck (single-core
PIL full decode ≈ 175 imgs/s), so two accelerations are provided:
  - the native libjpeg decoder in ``ssip_tpu.native`` (used when built),
  - a ``fast_scale`` path using DCT-domain 1/2 scaling (PIL ``draft`` /
    libjpeg scale_denom) for throughput mode — approximate, so parity-mode
    extraction keeps full decode.
"""

from __future__ import annotations

import logging
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

LOGGER = logging.getLogger(__name__)


def decode_image(
    path: Path, convert_rgb: bool = False, fast_scale: Optional[int] = None
) -> np.ndarray:
    """Decode one image to uint8 [H, W, C].

    ``fast_scale``: target short side for DCT-scaled decode (draft mode);
    None = full decode.
    """
    with Image.open(path) as img:
        if fast_scale is not None:
            img.draft("RGB", (fast_scale, fast_scale))
        if convert_rgb and img.mode != "RGB":
            img = img.convert("RGB")
        arr = np.asarray(img)
    if arr.ndim == 2:  # grayscale without conversion: replicate for the model
        arr = np.stack([arr] * 3, axis=-1)
    return arr


def try_decode_image(
    path: Path, convert_rgb: bool = False, fast_scale: Optional[int] = None
) -> Optional[np.ndarray]:
    """Decode-failure-tolerant variant (reference feature_extraction.py:276-284)."""
    try:
        return decode_image(path, convert_rgb=convert_rgb, fast_scale=fast_scale)
    except Exception as exc:  # noqa: BLE001 — any decode failure is tolerated
        LOGGER.warning("Failed to decode %s: %s", path, exc)
        return None


def _native_decoder():
    try:
        from ssip_tpu.native import decoder as native_decoder

        return native_decoder if native_decoder.available() else None
    except Exception:  # pragma: no cover - native lib optional
        return None


def decode_batch(
    paths: Sequence[Path],
    convert_rgb: bool = False,
    num_threads: int = 4,
    fast_scale: Optional[int] = None,
    use_native: bool = True,
) -> Tuple[List[Optional[np.ndarray]], List[Path]]:
    """Decode many images; returns (arrays-with-None-for-failures, failures).

    Uses the native libjpeg decoder when available (bitwise-identical to PIL
    full decode, ~1.5× faster; ~3× with DCT scaling), else a PIL thread
    pool. Thread count is capped at the core count — oversubscribing a
    CPU-bound decode on few cores only adds switching overhead.
    """
    import os

    num_threads = max(1, min(num_threads, os.cpu_count() or 1))
    native = _native_decoder() if use_native else None
    if native is not None:
        arrays = native.decode_batch(paths, num_threads=num_threads, fast_scale=fast_scale)
        # fall back to PIL for anything the native path rejected
        for i, arr in enumerate(arrays):
            if arr is None:
                arrays[i] = try_decode_image(paths[i], convert_rgb, fast_scale)
    else:
        with ThreadPoolExecutor(max_workers=num_threads) as pool:
            arrays = list(
                pool.map(
                    lambda p: try_decode_image(p, convert_rgb, fast_scale), paths
                )
            )
    failures = [p for p, a in zip(paths, arrays) if a is None]
    return arrays, failures

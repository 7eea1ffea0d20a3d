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


def preprocess_host_exact(
    arr: np.ndarray, resize: int, crop: int, use_native: bool = True
) -> np.ndarray:
    """Reference-exact host preprocessing: short-side resize to ``resize``
    (long side int-truncated — torchvision semantics) then center crop.

    Native fused triangle-filter kernel when built (BITWISE identical to
    PIL — it reimplements Pillow's fixed-point resample exactly,
    tests/test_native_decoder.py), PIL fallback otherwise. Both compute the
    same chain the device computes (ops/resize.py), so --host-preproc
    changes bytes-over-link, not numerics.
    """
    if crop > resize:
        # The resized short side is ``resize``, so a larger crop cannot be
        # satisfied — the PIL fallback would silently return a smaller
        # array (and the caller would then stretch it), breaking the
        # "exact" promise. Fail loudly instead.
        raise ValueError(
            f"crop ({crop}) must be <= resize ({resize}) for the exact "
            "host preprocessing chain"
        )
    native = _native_decoder() if use_native else None
    if native is not None:
        out = native.resize_crop(arr, resize, crop)
        if out is not None:
            return out
    from ssip_tpu.ops.resize import resize_target

    h0, w0 = arr.shape[:2]
    th, tw = resize_target(h0, w0, resize)
    if (h0, w0) != (th, tw):
        arr = np.asarray(Image.fromarray(arr).resize((tw, th), Image.BILINEAR))
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
    # torchvision CenterCrop offset: round((size - crop) / 2)
    top = int(round((arr.shape[0] - crop) / 2.0))
    left = int(round((arr.shape[1] - crop) / 2.0))
    return arr[top : top + crop, left : left + crop]


def decode_batch(
    paths: Sequence[Path],
    convert_rgb: bool = False,
    num_threads: int = 4,
    fast_scale: Optional[int] = None,
    use_native: bool = True,
    host_resize: Optional[int] = None,
    host_crop: Optional[int] = None,
) -> Tuple[List[Optional[np.ndarray]], List[Path]]:
    """Decode many images; returns (arrays-with-None-for-failures, failures).

    Uses the native libjpeg decoder when available (bitwise-identical to PIL
    full decode, ~1.5× faster; ~3× with DCT scaling), else a PIL thread
    pool. Thread count is capped at the core count — oversubscribing a
    CPU-bound decode on few cores only adds switching overhead.

    ``host_resize``/``host_crop``: apply the exact resize+crop chain
    (``preprocess_host_exact``) inside the same worker that decoded the
    image, so decode→preprocess stays one native-code round per image.
    """
    import os

    num_threads = max(1, min(num_threads, os.cpu_count() or 1))
    native = _native_decoder() if use_native else None

    if host_resize is not None and host_crop is not None:
        def work(p: Path) -> Optional[np.ndarray]:
            arr = native.decode_one(p, fast_scale) if native is not None else None
            if arr is None:
                arr = try_decode_image(p, convert_rgb, fast_scale)
            if arr is None:
                return None
            try:
                return preprocess_host_exact(
                    arr, host_resize, host_crop, use_native=use_native
                )
            except Exception as exc:  # noqa: BLE001 — tolerated like decode
                LOGGER.warning("Failed to preprocess %s: %s", p, exc)
                return None

        if num_threads <= 1 or len(paths) <= 1:
            arrays = [work(p) for p in paths]
        else:
            with ThreadPoolExecutor(max_workers=num_threads) as pool:
                arrays = list(pool.map(work, paths))
    elif native is not None:
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

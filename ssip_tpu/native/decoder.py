"""ctypes binding for the native libjpeg decoder.

API mirrors what ``ssip_tpu.data.decode.decode_batch`` needs: per-file
decode returning uint8 [H, W, 3] or None. The C calls release the GIL, so a
Python ThreadPoolExecutor genuinely overlaps file IO + decode with the main
thread's device dispatch even on a single core.
"""

from __future__ import annotations

import ctypes
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_LIB_PATH = Path(__file__).parent / "libssipdecode.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.ssip_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.ssip_jpeg_dims.restype = ctypes.c_int
        lib.ssip_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.ssip_jpeg_decode.restype = ctypes.c_int
        try:
            lib.ssip_resize_crop_u8.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
            ]
            lib.ssip_resize_crop_u8.restype = ctypes.c_int
        except AttributeError:  # stale .so from before the resize entry
            lib._ssip_no_resize = True
        _lib = lib
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _load() is not None


def _scale_denom_for(path: Path, fast_scale: Optional[int]) -> int:
    """Largest power-of-two denom keeping the short side ≥ fast_scale."""
    if fast_scale is None:
        return 1
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.ssip_jpeg_dims(str(path).encode(), 1, ctypes.byref(w), ctypes.byref(h)) != 0:
        return 1
    short = min(w.value, h.value)
    denom = 1
    while denom < 8 and short // (denom * 2) >= fast_scale:
        denom *= 2
    return denom


def decode_one(path: Path, fast_scale: Optional[int] = None) -> Optional[np.ndarray]:
    """uint8 [H, W, 3] or None (caller falls back to PIL). JPEG-only."""
    lib = _load()
    if lib is None:
        return None
    if Path(path).suffix.lower() not in (".jpg", ".jpeg"):
        return None
    denom = _scale_denom_for(Path(path), fast_scale)
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.ssip_jpeg_dims(str(path).encode(), denom, ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    buf = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.ssip_jpeg_decode(
        str(path).encode(), denom,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        buf.nbytes, ctypes.byref(w), ctypes.byref(h),
    )
    if rc != 0:
        return None
    return buf


def resize_crop(
    arr: np.ndarray, resize: int, crop: int
) -> Optional[np.ndarray]:
    """Exact preprocessing on the host: short-side resize to ``resize``
    (long side int-truncated — torchvision semantics) + center crop, via the
    native fused triangle-filter kernel. Returns uint8 [crop, crop, 3] or
    None when unavailable/inapplicable (caller falls back to PIL).

    BITWISE identical to PIL on every shape (Pillow's fixed-point resample
    reimplemented exactly); the device chain (ops/resize.py) is tested
    against the same PIL oracle — tests/test_native_decoder.py.
    """
    lib = _load()
    if (
        lib is None
        or getattr(lib, "_ssip_no_resize", False)
        or arr.dtype != np.uint8
        or arr.ndim != 3
        or arr.shape[2] != 3
    ):
        return None
    h, w = int(arr.shape[0]), int(arr.shape[1])
    if h <= 0 or w <= 0:
        return None
    from ssip_tpu.ops.resize import resize_target

    th, tw = resize_target(h, w, resize)
    row0 = int(round((th - crop) / 2.0))
    col0 = int(round((tw - crop) / 2.0))
    if row0 < 0 or col0 < 0:  # crop larger than resized image: PIL path
        return None
    src = np.ascontiguousarray(arr)
    out = np.empty((crop, crop, 3), np.uint8)
    rc = lib.ssip_resize_crop_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, th, tw, row0, col0, crop,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None


def decode_batch(
    paths: Sequence[Path], num_threads: int = 4, fast_scale: Optional[int] = None
) -> List[Optional[np.ndarray]]:
    if num_threads <= 1 or len(paths) <= 1:
        return [decode_one(p, fast_scale) for p in paths]
    with ThreadPoolExecutor(max_workers=num_threads) as pool:
        return list(pool.map(lambda p: decode_one(p, fast_scale), paths))

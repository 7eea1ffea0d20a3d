"""Device selection shim.

The reference exposes ``--device auto|cpu|cuda`` (reference:
src/supervised_training.py:63-69). Here ``auto`` means "whatever JAX's
default backend is" (TPU when present), ``cpu`` forces the host platform, and
``cuda``/``tpu``/anything-else maps to the accelerator backend when one
exists — the flag is kept for CLI compatibility, not because JAX needs it.
"""

from __future__ import annotations

import jax


def resolve_devices(device: str = "auto") -> list[jax.Device]:
    device = (device or "auto").lower()
    if device == "cpu":
        return jax.devices("cpu")
    # "auto", "cuda", "tpu", ... → best available backend.
    return jax.devices()


def device_label(devices: list[jax.Device]) -> str:
    if not devices:
        return "none"
    kinds = {d.platform for d in devices}
    return f"{'+'.join(sorted(kinds))}:{len(devices)}"

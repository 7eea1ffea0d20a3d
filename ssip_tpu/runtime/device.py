"""Device selection shim.

The reference exposes ``--device auto|cpu|cuda`` (reference:
src/supervised_training.py:63-69). Here ``auto`` means "whatever JAX's
default backend is" (TPU when present), ``cpu`` forces the host platform, and
``cuda``/``tpu``/anything-else maps to the accelerator backend when one
exists — the flag is kept for CLI compatibility, not because JAX needs it.
"""

from __future__ import annotations

import jax


def force_cpu_platform_if_requested(device: str) -> None:
    """Apply ``--device cpu`` BEFORE any backend touch (setup_jax included).

    Restricting ``jax_platforms`` to cpu keeps backend discovery away from
    accelerator plugins entirely — discovery of a TPU plugin whose tunnel
    is down hangs indefinitely, and a cpu-forced run must not depend on
    the accelerator's health. No-op for other devices; harmless (caught)
    if backends already initialized.
    """
    if (device or "").lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # backends already initialized
            pass


def resolve_devices(device: str = "auto") -> list[jax.Device]:
    device = (device or "auto").lower()
    if device == "cpu":
        # Restrict platform discovery to the CPU plugin BEFORE any backend
        # initializes: ``jax.devices("cpu")`` triggers discovery of EVERY
        # registered plugin, and an accelerator plugin whose transport is
        # unreachable (e.g. a downed TPU tunnel) hangs that discovery
        # indefinitely — ``--device cpu`` must never depend on the
        # accelerator's health. Once backends are already initialized the
        # update raises and the plain (already-completed) discovery below
        # is safe.
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # backends already initialized — discovery done
            pass
        return jax.devices("cpu")
    # "auto", "cuda", "tpu", ... → best available backend.
    return jax.devices()


def device_label(devices: list[jax.Device]) -> str:
    if not devices:
        return "none"
    kinds = {d.platform for d in devices}
    return f"{'+'.join(sorted(kinds))}:{len(devices)}"

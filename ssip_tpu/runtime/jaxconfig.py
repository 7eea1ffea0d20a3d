"""Process-wide JAX configuration for ssip_tpu workloads.

Centralizes the settings every CLI entry point wants:
  - persistent compilation cache (first TPU compiles here run 30-300s; the
    cache makes reruns near-instant),
  - cache thresholds tuned so even mid-sized programs are cached.

Idempotent; safe to call from every pipeline entry.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

_CONFIGURED = False


def setup_jax(cache_dir: str | os.PathLike | None = None) -> None:
    global _CONFIGURED
    if _CONFIGURED:
        return
    # CPU-backend AOT cache entries embed host machine features and can
    # SIGILL when reloaded under a different compile config — cache only
    # accelerator (TPU) compiles, which is where the 30-300s wins are anyway.
    platforms = str(
        jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    )
    primary = platforms.split(",")[0].strip() if platforms else ""
    if primary == "cpu":
        _CONFIGURED = True
        return
    # multi-host handshake must happen before backend initialization; no-op
    # unless SSIP_COORDINATOR/SSIP_NUM_PROCESSES configure a cluster. An
    # explicitly configured cluster that fails to join is FATAL — degrading
    # to N independent single-host jobs would silently clobber shared
    # outputs/, which is worse than crashing.
    from ssip_tpu.parallel.distributed import initialize as _dist_init

    _dist_init()

    # The config string only proves the user *asked* for an accelerator; on
    # a host with no TPU plugin JAX silently falls back to CPU, and caching
    # those CPU AOT entries recreates the SIGILL hazard. Gate on the
    # RESOLVED backend (safe to initialize now — the distributed handshake
    # above already ran).
    try:
        resolved = jax.default_backend()
    except Exception:  # pragma: no cover - backend probing is best-effort
        resolved = "cpu"
    if resolved == "cpu":
        _CONFIGURED = True
        return

    cache = Path(
        cache_dir
        or os.environ.get("SSIP_JAX_CACHE_DIR")
        or Path.home() / ".cache" / "ssip_tpu" / "jax"
    )
    try:
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    _CONFIGURED = True

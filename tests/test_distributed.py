"""Multi-host bootstrap helper (single-process no-op path)."""

import jax

from ssip_tpu.parallel.distributed import initialize, process_info


def test_initialize_noop_without_config(monkeypatch):
    monkeypatch.delenv("SSIP_COORDINATOR", raising=False)
    assert initialize() is False


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.setenv("SSIP_COORDINATOR", "localhost:1234")
    monkeypatch.setenv("SSIP_NUM_PROCESSES", "1")
    assert initialize() is False


def test_process_info_shape():
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] == len(jax.devices())

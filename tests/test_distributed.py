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


def test_two_process_cluster_joins(tmp_path):
    """Real jax.distributed join: 2 local CPU processes form one cluster
    and each sees the union of devices (the non-no-op path)."""
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = (
        "import json, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from ssip_tpu.parallel.distributed import initialize, process_info\n"
        "ok = initialize()\n"
        "print('RESULT ' + json.dumps({'ok': ok, **process_info()}))\n"
    )

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            SSIP_COORDINATOR=f"localhost:{port}",
            SSIP_NUM_PROCESSES="2",
            SSIP_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        env.pop("XLA_FLAGS", None)  # 1 local device per process
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", worker],
                env=env, cwd=os.getcwd(),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )

    results = []
    for p in procs:
        out, err = p.communicate(timeout=120)
        assert p.returncode == 0, f"worker failed: {err[-2000:]}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        results.append(json.loads(line[len("RESULT "):]))

    for i, r in enumerate(results):
        assert r["ok"] is True
        assert r["process_count"] == 2
        assert r["global_devices"] == sum(x["local_devices"] for x in results)
    assert {r["process_index"] for r in results} == {0, 1}

"""Auxiliary subsystems: profiler timers, sharded resumable extraction."""

import json

import numpy as np
import pytest

from ssip_tpu.runtime.profiler import PhaseTimer, trace


class TestPhaseTimer:
    def test_accumulates_and_rates(self):
        timer = PhaseTimer()
        with timer.phase("decode", items=10):
            pass
        with timer.phase("decode", items=5):
            pass
        summary = timer.summary()
        assert summary["decode"]["items"] == 15
        assert summary["decode"]["seconds"] >= 0

    def test_trace_noop_without_dir(self, monkeypatch):
        monkeypatch.delenv("SSIP_PROFILE_DIR", raising=False)
        with trace("section"):
            pass  # must not create anything or require a profiler


class TestShardedExtraction:
    def test_resume_skips_completed_shards(self, tiny_image_tree, tmp_path):
        from ssip_tpu.pipelines.extraction import ExtractionConfig
        from ssip_tpu.pipelines.sharded_extraction import run_sharded_extraction

        out = tmp_path / "outputs"
        cfg = ExtractionConfig(
            data_dir=tiny_image_tree, output_dir=out, batch_size=8,
            device="cpu", cache_decoded=False,
        )
        s1 = run_sharded_extraction(cfg, shard_size=8)
        assert s1.embeddings.shape == (22, 512)
        shards = sorted((out / "features" / "shards").glob("shard_*.npy"))
        assert len(shards) == 3  # 8 + 8 + 6

        # tamper one shard → only that one recomputes; merged result identical
        manifest_path = out / "features" / "shards" / "shard_00001.manifest.json"
        payload = json.loads(manifest_path.read_text())
        payload["digest"] = "tampered"
        manifest_path.write_text(json.dumps(payload))

        s2 = run_sharded_extraction(cfg, shard_size=8)
        np.testing.assert_array_equal(s1.embeddings, s2.embeddings)
        # artifacts written at the standard paths
        assert (out / "features" / "embeddings.npy").exists()
        meta = json.loads((out / "features" / "metadata.json").read_text())
        assert meta["num_images"] == 22

    def test_resume_with_decode_failures(self, tiny_image_tree, tmp_path):
        """Shards containing failed decodes must still validate on resume."""
        import time as _time

        from ssip_tpu.pipelines.extraction import ExtractionConfig
        from ssip_tpu.pipelines.sharded_extraction import run_sharded_extraction

        bad = tiny_image_tree / "sans_label" / "broken.jpg"
        bad.write_bytes(b"junk")
        out = tmp_path / "outputs"
        cfg = ExtractionConfig(
            data_dir=tiny_image_tree, output_dir=out, batch_size=8,
            device="cpu", cache_decoded=False,
        )
        s1 = run_sharded_extraction(cfg, shard_size=8)
        assert s1.embeddings.shape[0] == 22  # 23 files - 1 failure
        assert len(s1.failures) == 1

        # re-run: every shard (incl. the failure-bearing one) must be reused
        t0 = _time.perf_counter()
        s2 = run_sharded_extraction(cfg, shard_size=8)
        assert _time.perf_counter() - t0 < 10  # reuse, not recompute
        np.testing.assert_array_equal(s1.embeddings, s2.embeddings)
        assert len(s2.failures) == 1
        assert len(s2.records) == 22

    def test_shard_size_change_recomputes_cleanly(self, tiny_image_tree, tmp_path):
        from ssip_tpu.pipelines.extraction import ExtractionConfig
        from ssip_tpu.pipelines.sharded_extraction import run_sharded_extraction

        out = tmp_path / "outputs"
        cfg = ExtractionConfig(
            data_dir=tiny_image_tree, output_dir=out, batch_size=8,
            device="cpu", cache_decoded=False,
        )
        a = run_sharded_extraction(cfg, shard_size=8)
        b = run_sharded_extraction(cfg, shard_size=16)
        # different shard sizes compile different fused programs → f32
        # reduction-order noise at the 1e-6 level is expected
        np.testing.assert_allclose(a.embeddings, b.embeddings, atol=1e-5)

"""Data layer: discovery, splits, sampler, store, feeder."""

import numpy as np
import pytest

from ssip_tpu.data.discovery import (
    compute_dataset_digest,
    discover_image_records,
    labeled_folder,
    unlabeled_files,
)
from ssip_tpu.data.pipeline import ImageStore, iter_device_batches
from ssip_tpu.data.splits import (
    balanced_epoch_indices,
    balanced_sample_weights,
    stratified_split,
)


class TestDiscovery:
    def test_discover_order_and_buckets(self, tiny_image_tree):
        records = discover_image_records(tiny_image_tree)
        assert len(records) == 22
        labeled = [r for r in records if r.bucket == "labeled"]
        unlabeled = [r for r in records if r.bucket == "unlabeled"]
        assert len(labeled) == 12 and len(unlabeled) == 10
        # labeled first (sorted class dirs), then unlabeled; each sorted
        assert records[0].label == "cancer"
        assert [r.label for r in labeled] == sorted(
            [r.label for r in labeled], key=lambda x: (x != "cancer",)
        )
        paths = [str(r.relative_path) for r in records]
        assert paths[:12] == sorted(paths[:12])
        assert paths[12:] == sorted(paths[12:])

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            discover_image_records(tmp_path / "nope")

    def test_labeled_folder_class_indexing(self, tiny_image_tree):
        paths, targets, classes = labeled_folder(tiny_image_tree / "avec_labels")
        assert classes == ["cancer", "normal"]
        assert targets[:6] == [0] * 6 and targets[6:] == [1] * 6

    def test_unlabeled_suffix_filter(self, tiny_image_tree):
        (tiny_image_tree / "sans_label" / "notes.txt").write_text("x")
        files = unlabeled_files(tiny_image_tree / "sans_label")
        assert len(files) == 10
        assert all(f.suffix == ".jpg" for f in files)

    def test_digest_stable_and_sensitive(self, tiny_image_tree):
        records = discover_image_records(tiny_image_tree)
        d1 = compute_dataset_digest(records)
        d2 = compute_dataset_digest(list(reversed(records)))
        assert d1 == d2  # order-independent (sorted internally)
        import os

        target = tiny_image_tree / "sans_label" / "unlabeled_00.jpg"
        os.utime(target, (1000000000, 1000000000))  # distinct integral mtime
        assert compute_dataset_digest(records) != d1


class TestSplits:
    def test_matches_sklearn_reference_semantics(self):
        targets = [0] * 50 + [1] * 50
        train, val, test = stratified_split(targets, 0.2, 0.2, seed=42)
        assert len(train) == 60 and len(val) == 20 and len(test) == 20
        assert set(train) | set(val) | set(test) == set(range(100))
        t = np.asarray(targets)
        for part in (train, val, test):
            assert t[part].sum() == len(part) // 2  # stratified

    def test_deterministic(self):
        targets = [0] * 30 + [1] * 30
        a = stratified_split(targets, 0.2, 0.2, seed=42)
        b = stratified_split(targets, 0.2, 0.2, seed=42)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
        c = stratified_split(targets, 0.2, 0.2, seed=7)
        assert not all(np.array_equal(x, y) for x, y in zip(a, c))


class TestSampler:
    def test_weights_inverse_class_count(self):
        w = balanced_sample_weights([0, 0, 0, 1])
        np.testing.assert_allclose(w, [1 / 3, 1 / 3, 1 / 3, 1.0])

    def test_single_class_uniform(self):
        np.testing.assert_allclose(balanced_sample_weights([1, 1, 1]), 1.0)

    def test_epoch_indices_balanced(self):
        labels = [0] * 90 + [1] * 10
        idx = balanced_epoch_indices(labels, seed=42, epoch=0, num_samples=10000)
        frac_pos = (np.asarray(labels)[idx] == 1).mean()
        assert 0.45 < frac_pos < 0.55

    def test_epoch_indices_vary_by_epoch(self):
        labels = [0] * 10 + [1] * 10
        a = balanced_epoch_indices(labels, seed=42, epoch=0)
        b = balanced_epoch_indices(labels, seed=42, epoch=1)
        assert not np.array_equal(a, b)
        np.testing.assert_array_equal(a, balanced_epoch_indices(labels, seed=42, epoch=0))


class TestImageStore:
    def test_store_and_feeder(self, tiny_image_tree):
        from ssip_tpu.parallel import batch_sharding, build_mesh

        records = discover_image_records(tiny_image_tree)
        store = ImageStore.from_paths([r.absolute_path for r in records])
        assert len(store) == 22
        assert store.image_shape == (64, 64, 3)
        assert len(store.valid_indices()) == 22

        mesh = build_mesh()
        batches = list(
            iter_device_batches(
                store, store.valid_indices(), 8, sharding=batch_sharding(mesh)
            )
        )
        assert [b.valid for b in batches] == [8, 8, 6]
        assert all(b.data.shape == (8, 64, 64, 3) for b in batches)
        # padding rows are zero
        last = np.asarray(batches[-1].data)
        assert (last[6:] == 0).all()

    def test_corrupt_file_tolerated(self, tiny_image_tree):
        bad = tiny_image_tree / "sans_label" / "corrupt.jpg"
        bad.write_bytes(b"not a jpeg")
        files = unlabeled_files(tiny_image_tree / "sans_label")
        store = ImageStore.from_paths(files)
        assert len(store.failures) == 1
        assert store.failures[0].name == "corrupt.jpg"
        assert len(store.valid_indices()) == len(files) - 1
        bad.unlink()

    def test_streamed_decode_matches_store(self, tiny_image_tree):
        from ssip_tpu.data.pipeline import iter_streamed_decode_batches

        records = discover_image_records(tiny_image_tree)
        paths = [r.absolute_path for r in records]
        store = ImageStore.from_paths(paths)

        batches = list(
            iter_streamed_decode_batches(paths, 8, (64, 64, 3))
        )
        assert [b.valid for b in batches] == [8, 8, 6]
        assert all(b.data.shape == (8, 64, 64, 3) for b in batches)
        streamed = np.concatenate(
            [np.asarray(b.data)[: b.valid] for b in batches]
        )
        idx = np.concatenate([b.indices for b in batches])
        np.testing.assert_array_equal(idx, np.arange(22))
        np.testing.assert_array_equal(streamed, store.gather(np.arange(22)))

    def test_streamed_decode_tolerates_corrupt_and_odd_size(self, tiny_image_tree):
        from PIL import Image

        from ssip_tpu.data.pipeline import iter_streamed_decode_batches

        bad = tiny_image_tree / "sans_label" / "corrupt.jpg"
        bad.write_bytes(b"not a jpeg")
        odd = tiny_image_tree / "sans_label" / "odd_size.jpg"
        Image.fromarray(
            np.zeros((32, 48, 3), dtype=np.uint8)
        ).save(odd)
        files = unlabeled_files(tiny_image_tree / "sans_label")
        failures: list = []
        batches = list(
            iter_streamed_decode_batches(
                files, 5, (64, 64, 3), failures=failures
            )
        )
        assert [p.name for p in failures] == ["corrupt.jpg"]
        total_valid = sum(b.valid for b in batches)
        assert total_valid == len(files) - 1
        # valid rows are compacted to the front; odd-size row was resized
        for b in batches:
            assert b.data.shape[0] == 5
            assert len(b.indices) == b.valid
        bad.unlink()
        odd.unlink()

    def test_streamed_decode_early_exit_joins_threads(self, tiny_image_tree):
        import threading

        from ssip_tpu.data.pipeline import iter_streamed_decode_batches

        files = unlabeled_files(tiny_image_tree / "sans_label")
        it = iter_streamed_decode_batches(files, 2, (64, 64, 3), prefetch=1)
        next(it)
        it.close()  # consumer abandons the stream mid-way
        # give the generator's finally a beat, then assert no leaked threads
        remaining = [
            t.name for t in threading.enumerate()
            if t.name in ("ssip-decode", "ssip-h2d") and t.is_alive()
        ]
        assert remaining == []

    def test_decode_cache_roundtrip(self, tiny_image_tree, tmp_path):
        records = discover_image_records(tiny_image_tree)
        paths = [r.absolute_path for r in records]
        s1 = ImageStore.from_paths(paths, cache_dir=tmp_path, cache_key="k1")
        s2 = ImageStore.from_paths(paths, cache_dir=tmp_path, cache_key="k1")
        np.testing.assert_array_equal(np.asarray(s1.packed), np.asarray(s2.packed))
        # different path list → cache miss, no crash
        s3 = ImageStore.from_paths(paths[:5], cache_dir=tmp_path, cache_key="k1")
        assert len(s3) == 5

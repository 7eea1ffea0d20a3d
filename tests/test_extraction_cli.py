"""End-to-end extraction pipeline on the synthetic tree (CPU, 8-dev mesh)."""

import json

import numpy as np
import pandas as pd

from src.feature_extraction import main as extraction_main


def test_extraction_cli_end_to_end(tiny_image_tree, tmp_path, monkeypatch):
    out = tmp_path / "outputs"
    monkeypatch.chdir(tmp_path)
    extraction_main(
        [
            "--data-dir", str(tiny_image_tree),
            "--device", "cpu",
            "--batch-size", "8",
            "--output-dir", str(out),
        ]
    )

    emb = np.load(out / "features" / "embeddings.npy")
    assert emb.shape == (22, 512)
    assert emb.dtype == np.float32
    assert np.isfinite(emb).all()

    df = pd.read_csv(out / "features" / "embeddings.csv")
    assert list(df.columns) == ["index", "path", "bucket", "label"]
    assert len(df) == 22
    assert (df["bucket"] == "labeled").sum() == 12
    assert df.iloc[0]["label"] == "cancer"
    # unlabeled rows carry empty label
    assert df[df.bucket == "unlabeled"]["label"].isna().all()

    meta = json.loads((out / "features" / "metadata.json").read_text())
    for key in (
        "backbone", "weights", "layer", "embedding_dimension", "input_resize",
        "input_crop", "normalization_mean", "normalization_std", "channel_policy",
        "date_utc", "num_images", "failed_images", "device", "dataset_dir",
        "dataset_digest", "sanity_checks", "neighbor_probe",
    ):
        assert key in meta, key
    assert meta["embedding_dimension"] == 512
    assert meta["num_images"] == 22
    assert meta["failed_images"] == 0
    assert len(meta["dataset_digest"]) == 64
    assert meta["sanity_checks"]["num_vectors"] == 22
    assert len(meta["neighbor_probe"]) == 8
    for probe in meta["neighbor_probe"]:
        assert probe["query"] != probe["neighbor"]
        assert -1.0001 <= probe["similarity"] <= 1.0001

    summary_md = (out / "notes" / "feature_summary.md").read_text()
    assert "# Feature Extraction Summary" in summary_md
    assert "Nearest Neighbor Spot Check" in summary_md
    assert (out / "logs" / "feature_extraction.log").exists()


def test_streaming_extraction_matches_store_path(tiny_image_tree, tmp_path):
    """The O(batch)-memory streamed shape is numerically identical to the
    decode-once store shape (same embeddings, same record order)."""
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    cfg = dict(
        data_dir=tiny_image_tree,
        device="cpu",
        batch_size=8,
        cache_decoded=False,
    )
    stored = run_extraction(
        ExtractionConfig(output_dir=tmp_path / "o1", streaming="never", **cfg)
    )
    streamed = run_extraction(
        ExtractionConfig(output_dir=tmp_path / "o2", streaming="always", **cfg)
    )
    # different execution shapes compile different programs (one fused scan
    # vs per-batch steps) → fp reduction order differs at ~1e-7
    np.testing.assert_allclose(
        stored.embeddings, streamed.embeddings, atol=1e-5, rtol=1e-5
    )
    assert [r.relative_path for r in stored.records] == [
        r.relative_path for r in streamed.records
    ]


def test_streaming_canonicalizes_to_majority_shape(tmp_path):
    """Mixed-shape corpus whose FIRST image is a minority shape: the
    streamed shape must canonicalize to the corpus MAJORITY shape (like
    ImageStore.from_paths), not the first image's — otherwise streamed
    embeddings diverge from the store path and streaming='auto' results
    depend on cache presence (ADVICE r2)."""
    from PIL import Image

    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    gen = np.random.default_rng(3)
    root = tmp_path / "ds"
    (root / "sans_label").mkdir(parents=True)
    # 'a_odd' sorts first → the first decodable image is the minority shape
    Image.fromarray(
        gen.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ).save(root / "sans_label" / "a_odd.jpg")
    for i in range(5):
        Image.fromarray(
            gen.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        ).save(root / "sans_label" / f"b_{i}.jpg")

    cfg = dict(data_dir=root, device="cpu", batch_size=4, cache_decoded=False)
    stored = run_extraction(
        ExtractionConfig(output_dir=tmp_path / "o1", streaming="never", **cfg)
    )
    streamed = run_extraction(
        ExtractionConfig(output_dir=tmp_path / "o2", streaming="always", **cfg)
    )
    np.testing.assert_allclose(
        stored.embeddings, streamed.embeddings, atol=1e-5, rtol=1e-5
    )
    assert [r.relative_path for r in stored.records] == [
        r.relative_path for r in streamed.records
    ]


def test_env_weights_arch_mismatch_skipped_not_fatal(tmp_path, monkeypatch):
    """SSIP_RESNET18_WEIGHTS pointing at an r18 checkpoint must not brick
    --arch resnet34 extraction: non-explicit candidates with the wrong
    topology are skipped with a warning (ADVICE r2). An explicit --weights
    mismatch still fails loudly."""
    import pytest

    from ssip_tpu.pipelines.extraction import ExtractionConfig, _resolve_weights
    from tests.test_weights_cli import _write_checkpoint

    ckpt = tmp_path / "resnet18_imagenet1k.pt"
    _write_checkpoint(ckpt)
    monkeypatch.setenv("SSIP_RESNET18_WEIGHTS", str(ckpt))

    cfg = ExtractionConfig(arch="resnet34", output_dir=tmp_path / "o")
    variables, source = _resolve_weights(cfg)
    assert source.startswith("random_init"), source
    assert "layer2_2" in variables["params"]  # resnet34 topology

    with pytest.raises(ValueError, match="does not match --arch resnet34"):
        _resolve_weights(
            ExtractionConfig(
                arch="resnet34", weights=ckpt, output_dir=tmp_path / "o2"
            )
        )


def test_streaming_extraction_tolerates_corrupt_file(tiny_image_tree, tmp_path):
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    bad = tiny_image_tree / "sans_label" / "zz_corrupt.jpg"
    bad.write_bytes(b"not a jpeg")
    summary = run_extraction(
        ExtractionConfig(
            data_dir=tiny_image_tree,
            output_dir=tmp_path / "o",
            device="cpu",
            batch_size=8,
            cache_decoded=False,
            streaming="always",
        )
    )
    assert summary.embeddings.shape[0] == 22
    assert [p.name for p in summary.failures] == ["zz_corrupt.jpg"]
    bad.unlink()


def test_bf16_fast_path_close_to_f32_parity_mode(tiny_image_tree, tmp_path):
    """Throughput mode (bf16 + folded BN + s2d stem) tracks the exact f32
    forward: unit-normalized embeddings stay highly aligned per image."""
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    cfg = dict(
        data_dir=tiny_image_tree, device="cpu", batch_size=8, cache_decoded=False,
    )
    exact = run_extraction(
        ExtractionConfig(output_dir=tmp_path / "f32", compute_dtype="float32", **cfg)
    ).embeddings
    fast = run_extraction(
        ExtractionConfig(output_dir=tmp_path / "bf16", compute_dtype="bfloat16", **cfg)
    ).embeddings

    def unit(a):
        return a / np.linalg.norm(a, axis=1, keepdims=True)

    cos = (unit(exact) * unit(fast)).sum(axis=1)
    assert cos.min() > 0.995, cos.min()


def test_host_preproc_streaming_matches_store_path(tmp_path):
    """--host-preproc ships only the crop over the link with EXACT
    numerics: host PIL resize+crop is bitwise the device chain, so
    embeddings match the decode-once store path."""
    from PIL import Image

    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    # full-size images so the resize is the reference's exact downscale
    # chain, not an upsample. The whole corpus shares one NON-SQUARE shape:
    # "exact" requires the host resize to reproduce torchvision's
    # aspect-preserving short-side semantics (a plain square resize
    # diverges by ~0.5 abs). Mixed-shape corpora are excluded on purpose —
    # there the store path first squashes minority-shaped rows to the
    # majority shape (its batching normalization) while host-preproc
    # applies the reference's per-image chain directly, so they
    # legitimately differ on those rows.
    gen = np.random.default_rng(11)
    root = tmp_path / "ds"
    (root / "sans_label").mkdir(parents=True)
    for i in range(6):
        Image.fromarray(
            gen.integers(0, 255, (384, 512, 3), dtype=np.uint8)
        ).save(root / "sans_label" / f"u_{i}.jpg")

    cfg = dict(
        data_dir=root, device="cpu", batch_size=4, cache_decoded=False,
    )
    stored = run_extraction(
        ExtractionConfig(output_dir=tmp_path / "o1", streaming="never", **cfg)
    )
    hostprep = run_extraction(
        ExtractionConfig(
            output_dir=tmp_path / "o2", streaming="always",
            host_preproc=True, **cfg,
        )
    )
    np.testing.assert_allclose(
        stored.embeddings, hostprep.embeddings, atol=1e-5, rtol=1e-5
    )
    assert [r.relative_path for r in stored.records] == [
        r.relative_path for r in hostprep.records
    ]


def test_turbo_streaming_extraction_runs_and_is_deterministic(
    tiny_image_tree, tmp_path
):
    """--fast-decode turbo mode (DCT-scaled decode + host crop): approximate
    resample numerics by design, but complete, ordered, and deterministic."""
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    cfg = dict(
        data_dir=tiny_image_tree, device="cpu", batch_size=8,
        cache_decoded=False, streaming="always", fast_decode=True,
    )
    s1 = run_extraction(ExtractionConfig(output_dir=tmp_path / "t1", **cfg))
    s2 = run_extraction(ExtractionConfig(output_dir=tmp_path / "t2", **cfg))
    assert s1.embeddings.shape == (22, 512)
    assert np.isfinite(s1.embeddings).all()
    np.testing.assert_array_equal(s1.embeddings, s2.embeddings)


def test_extraction_deterministic(tiny_image_tree, tmp_path):
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    cfg = dict(
        data_dir=tiny_image_tree,
        device="cpu",
        batch_size=8,
        cache_decoded=False,
    )
    s1 = run_extraction(ExtractionConfig(output_dir=tmp_path / "o1", **cfg))
    s2 = run_extraction(ExtractionConfig(output_dir=tmp_path / "o2", **cfg))
    np.testing.assert_array_equal(s1.embeddings, s2.embeddings)


def test_crop_larger_than_resize_rejected(tmp_path):
    """crop > resize cannot be satisfied by the short-side-resize chain;
    it must fail loudly at config time (and in the host chain) instead of
    silently producing geometry-distorted 'exact' inputs."""
    import pytest

    from ssip_tpu.data.decode import preprocess_host_exact
    from ssip_tpu.pipelines.extraction import ExtractionConfig

    with pytest.raises(ValueError, match="crop"):
        ExtractionConfig(data_dir=tmp_path, resize=224, crop=256)
    arr = np.zeros((300, 400, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="crop"):
        preprocess_host_exact(arr, resize=224, crop=256)


def test_header_shape_matches_decoded_shape(tmp_path):
    """_header_shape (no pixel decode) must agree with what decode_image
    produces, including the grayscale→3-channel stacking."""
    from PIL import Image

    from ssip_tpu.data.decode import decode_image
    from ssip_tpu.pipelines.extraction import _header_shape

    gen = np.random.default_rng(0)
    rgb = tmp_path / "rgb.jpg"
    Image.fromarray(gen.integers(0, 255, (48, 64, 3), dtype=np.uint8)).save(rgb)
    gray = tmp_path / "gray.png"
    Image.fromarray(gen.integers(0, 255, (32, 40), dtype=np.uint8)).save(gray)
    corrupt = tmp_path / "corrupt.jpg"
    corrupt.write_bytes(b"not an image")

    for p in (rgb, gray):
        assert _header_shape(p) == decode_image(p).shape
    assert _header_shape(corrupt) is None

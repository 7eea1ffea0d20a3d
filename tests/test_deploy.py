"""Deployment layer: AOT export round-trip, artifact format, HTTP serving.

The exported program must reproduce the in-process serving forward exactly
(same normalize → forward → softmax math), survive a save/load round-trip
through the single-file artifact, accept any batch size via its symbolic
batch dim, and serve over HTTP with threshold semantics matching the
calibrated operating point (reference common.py:668-746 selects it;
semi_supervised.py:472-511 applies it at triage time).
"""

import json
import threading
import urllib.request
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def fabricated_run(tmp_path_factory):
    """A fake pipeline run: seeded-init checkpoint + operating point.

    Training is exercised elsewhere (test_serving.py) — deployment only
    needs the artifact files, so seeded weights keep this module fast.
    """
    import jax

    from ssip_tpu.models import MODEL_FACTORIES
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.runtime.artifacts import ArtifactRegistry
    from ssip_tpu.train.checkpoints import save_checkpoint

    out = tmp_path_factory.mktemp("run")
    reg = ArtifactRegistry(out)
    model = MODEL_FACTORIES["resnet18"](num_classes=2)
    variables = jax.device_get(seeded_init_host(model, 7, (1, 32, 32, 3)))
    save_checkpoint(reg.semi_checkpoint, variables)
    reg.operating_point_json.parent.mkdir(parents=True, exist_ok=True)
    reg.operating_point_json.write_text(json.dumps({
        "model": "semi_supervised_resnet18",
        "arch": "resnet18",
        "positive_class": "cancer",
        "classes": ["cancer", "normal"],
        "threshold": 0.62,
        "policy": "constrained",
    }))
    return out, variables


@pytest.fixture(scope="module")
def exported_artifact(fabricated_run, tmp_path_factory):
    out_dir, _ = fabricated_run
    path = tmp_path_factory.mktemp("art") / "semi_serving.ssip.npz"
    import src.export_model as export_model

    export_model.main([
        "--output-dir", str(out_dir), "--model", "semi",
        "--out", str(path), "--image-size", "32",
    ])
    return path


def test_export_roundtrip_matches_direct_forward(fabricated_run, exported_artifact):
    """Loaded artifact == the exact serving math, to f32 exactness."""
    import jax

    from ssip_tpu.deploy.export import ExportedModel, build_serving_fn

    _, variables = fabricated_run
    model = ExportedModel.load(exported_artifact)
    rng = np.random.default_rng(3)
    images = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)

    direct = jax.jit(build_serving_fn("resnet18", 2, "float32"))(
        variables, images
    )
    got = model.predict_probs(images)
    np.testing.assert_allclose(got, np.asarray(direct), rtol=0, atol=1e-6)
    # softmax rows
    np.testing.assert_allclose(got.sum(axis=1), 1.0, atol=1e-5)


def test_export_matches_in_process_predictor(fabricated_run, exported_artifact):
    """ExportedModel and ScreeningPredictor agree on the same inputs."""
    from ssip_tpu.deploy.export import ExportedModel
    from ssip_tpu.serving import ScreeningPredictor

    out_dir, _ = fabricated_run
    exported = ExportedModel.load(exported_artifact)
    predictor = ScreeningPredictor.from_artifacts(
        out_dir, model="semi", image_size=32, batch_size=4
    )
    rng = np.random.default_rng(5)
    images = rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8)
    a = exported.predict_images(images)
    b = predictor.predict_images(images)
    np.testing.assert_allclose(a.prob_positive, b.prob_positive, atol=1e-5)
    assert a.threshold == b.threshold == 0.62
    np.testing.assert_array_equal(a.flagged, b.flagged)


def test_symbolic_batch_and_bucketing(exported_artifact):
    """Any N works; bucketed padding must not change per-row outputs."""
    from ssip_tpu.deploy.export import ExportedModel

    model = ExportedModel.load(exported_artifact, max_batch=4)
    rng = np.random.default_rng(9)
    images = rng.integers(0, 256, (7, 32, 32, 3), dtype=np.uint8)
    full = model.predict_probs(images)          # chunks of 4 + bucket-of-4 pad
    assert full.shape == (7, 2)
    for i in (0, 3, 6):                         # chunk starts/ends
        one = model.predict_probs(images[i:i + 1])
        np.testing.assert_allclose(full[i], one[0], atol=1e-6)
    assert model.predict_probs(images[:0]).shape == (0, 2)


def test_manifest_and_format(exported_artifact):
    """The artifact is a plain npz: manifest + blob + one array per leaf."""
    with np.load(exported_artifact) as z:
        manifest = json.loads(bytes(z["__manifest__"]).decode("utf-8"))
        files = set(z.files)
    assert manifest["version"] == 1
    assert manifest["arch"] == "resnet18"
    assert manifest["threshold"] == 0.62
    assert manifest["positive_class"] == "cancer"
    assert manifest["pos_index"] == 0
    assert manifest["classes"] == ["cancer", "normal"]
    assert set(manifest["platforms"]) == {"cpu", "tpu"}
    assert "__stablehlo__" in files
    assert any(f.startswith("var/params/") for f in files)
    assert any(f.startswith("var/batch_stats/") for f in files)


def test_input_shape_validation(exported_artifact):
    from ssip_tpu.deploy.export import ExportedModel

    model = ExportedModel.load(exported_artifact)
    with pytest.raises(ValueError, match="eval-resized"):
        model.predict_probs(np.zeros((2, 48, 48, 3), np.uint8))


def test_http_server_end_to_end(exported_artifact, tmp_path):
    """healthz / manifest / predict (raw bytes) / predict_paths (JSON)."""
    from PIL import Image

    from ssip_tpu.deploy.export import ExportedModel
    from ssip_tpu.deploy.server import make_server

    model = ExportedModel.load(exported_artifact)
    httpd = make_server(model, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(f"{base}/manifest", timeout=30) as r:
            assert json.load(r)["arch"] == "resnet18"

        rng = np.random.default_rng(1)
        arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        img_path = tmp_path / "img.png"           # PNG: lossless round-trip
        Image.fromarray(arr).save(img_path)

        req = urllib.request.Request(
            f"{base}/predict", data=img_path.read_bytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.load(r)
        assert body["threshold"] == 0.62
        expected = model.predict_images(arr[None])
        assert body["prob_positive"] == pytest.approx(
            float(expected.prob_positive[0]), abs=1e-5
        )
        assert body["flagged"] == bool(expected.flagged[0])

        req = urllib.request.Request(
            f"{base}/predict_paths",
            data=json.dumps({"paths": [str(img_path)]}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            rows = json.load(r)["rows"]
        assert len(rows) == 1
        assert rows[0]["prob_positive"] == pytest.approx(
            float(expected.prob_positive[0]), abs=1e-5
        )

        # malformed request → 400, server stays up
        req = urllib.request.Request(
            f"{base}/predict", data=b"not an image", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as err:
            urllib.request.urlopen(req, timeout=30)
        assert err.value.code == 400
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=10)


def test_int8_export_matches_in_process_quantized_path(
    fabricated_run, tmp_path, tiny_image_tree
):
    """int8 artifact == the same quantized program run in-process (exact),
    and stays within quantization noise of the f32 export's probabilities."""
    import jax
    import jax.numpy as jnp

    import src.export_model as export_model
    from ssip_tpu.deploy.export import (
        ExportedModel,
        build_serving_fn,
        build_serving_fn_int8,
        quantized_serving_bundle,
    )

    out_dir, variables = fabricated_run
    path = tmp_path / "semi_int8.ssip.npz"
    export_model.main([
        "--output-dir", str(out_dir), "--model", "semi",
        "--out", str(path), "--image-size", "32",
        "--compute-dtype", "int8",
        "--calibration-images", str(tiny_image_tree / "sans_label"),
        "--calibration-count", "8",
    ])
    model = ExportedModel.load(path)
    assert model.manifest["compute_dtype"] == "int8"
    assert model.manifest["calibration_images"] == 8

    rng = np.random.default_rng(13)
    images = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    got = model.predict_probs(images)

    # exact vs the in-process quantized program (same calibration data)
    from ssip_tpu.data.decode import decode_batch
    from ssip_tpu.train.data import _resize_on_device

    paths = sorted((tiny_image_tree / "sans_label").glob("*"))[:8]
    arrays, _ = decode_batch(paths, convert_rgb=True, num_threads=2)
    calib = np.asarray(_resize_on_device([a for a in arrays if a is not None], 32))
    bundle = quantized_serving_bundle(variables, jnp.asarray(calib), "resnet18")
    direct = jax.jit(build_serving_fn_int8("resnet18"))(bundle, images)
    np.testing.assert_allclose(got, np.asarray(direct), rtol=0, atol=1e-6)

    # quantization-noise envelope vs the f32 serving math
    f32 = jax.jit(build_serving_fn("resnet18", 2, "float32"))(variables, images)
    np.testing.assert_allclose(got, np.asarray(f32), atol=0.25)


def test_server_wraps_in_process_predictor(fabricated_run):
    """src.serve's checkpoint mode: make_server over ScreeningPredictor."""
    import src.serve as serve_cli
    from ssip_tpu.deploy.server import make_server

    out_dir, _ = fabricated_run
    args = serve_cli.parse_args([
        "--output-dir", str(out_dir), "--model", "semi",
        "--image-size", "32", "--max-batch", "4",
    ])
    model = serve_cli.build_model(args)
    httpd = make_server(model, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/manifest", timeout=30
        ) as r:
            m = json.load(r)
        assert m["arch"] == "resnet18"
        assert m["threshold"] == 0.62
    finally:
        httpd.shutdown()
        httpd.server_close()
        thread.join(timeout=10)


def test_threshold_override_flag(fabricated_run, tmp_path):
    import src.export_model as export_model
    from ssip_tpu.deploy.export import ExportedModel

    out_dir, _ = fabricated_run
    path = tmp_path / "thr.ssip.npz"
    export_model.main([
        "--output-dir", str(out_dir), "--model", "semi",
        "--out", str(path), "--image-size", "32", "--threshold", "0.9",
    ])
    assert ExportedModel.load(path).threshold == 0.9

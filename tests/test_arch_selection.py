"""Backbone selection (--arch): reference is fixed resnet18
(common.py:299-304, feature_extraction.py:210-227); 34/50 are TPU-native
extras. The architecture must be recorded in artifacts so every
post-hoc consumer (threshold_sweep, serving) rebuilds the right model.
"""

from __future__ import annotations

import json

import numpy as np
import pytest


def test_extraction_resnet50_yields_2048d(tiny_image_tree, tmp_path):
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    summary = run_extraction(
        ExtractionConfig(
            data_dir=tiny_image_tree,
            output_dir=tmp_path / "o",
            device="cpu",
            batch_size=8,
            cache_decoded=False,
            arch="resnet50",
        )
    )
    assert summary.embeddings.shape[1] == 2048
    meta = json.loads((tmp_path / "o" / "features" / "metadata.json").read_text())
    assert meta["architecture"] == "resnet50"
    assert meta["backbone"] == "ssip_tpu.flax.resnet50"


def test_folded_apply_matches_exact_forward_resnet34():
    import jax.numpy as jnp

    from ssip_tpu.models import ResNet34
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.models.inference import fold_resnet_extractor, make_folded_apply
    from ssip_tpu.models.resnet import MODEL_STAGES

    model = ResNet34(num_classes=None)
    variables = seeded_init_host(model, 7, (1, 64, 64, 3))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    )
    exact = model.apply(variables, x, train=False)
    folded = fold_resnet_extractor(
        variables, stage_sizes=MODEL_STAGES["resnet34"], bottleneck=False
    )
    fast = make_folded_apply(
        stage_sizes=MODEL_STAGES["resnet34"], compute_dtype=jnp.float32
    )(folded, x)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(fast), atol=2e-4)


@pytest.fixture(scope="module")
def resnet34_run(tmp_path_factory):
    """One tiny resnet34 training run shared by the roundtrip tests."""
    from PIL import Image

    from ssip_tpu.pipelines.supervised import run_supervised
    from ssip_tpu.pipelines.train_config import TrainingConfig

    gen = np.random.default_rng(5)
    root = tmp_path_factory.mktemp("ds34")
    for cls, lo, hi in (("cancer", 150, 255), ("normal", 0, 100)):
        d = root / "avec_labels" / cls
        d.mkdir(parents=True)
        for i in range(8):
            Image.fromarray(
                gen.integers(lo, hi, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{cls}_{i:02d}.jpg")
    out = tmp_path_factory.mktemp("out34")
    cfg = TrainingConfig(
        strong_data_dir=root / "avec_labels",
        arch="resnet34",
        batch_size=8,
        image_size=32,
        baseline_epochs=1,
        target_recall=0.9,
        output_dir=out,
        device="cpu",
    )
    run_supervised(cfg)
    return root, out, cfg


def test_training_records_arch(resnet34_run):
    _, out, _ = resnet34_run
    payload = json.loads((out / "notes" / "training_history.json").read_text())
    assert payload["arch"] == "resnet34"


def test_threshold_sweep_rebuilds_recorded_arch(resnet34_run):
    from ssip_tpu.pipelines.sweep import SweepConfig, run_sweep

    root, out, cfg = resnet34_run
    result = run_sweep(
        SweepConfig(
            strong_data_dir=root / "avec_labels",
            output_dir=out,
            model="baseline",
            device="cpu",
            image_size=32,
        )
    )
    assert {"TP", "FP", "TN", "FN"} <= set(result)
    assert (out / "tables" / "threshold_sweep_baseline.csv").exists()


def test_ported_weights_arch_mismatch_fails_clearly():
    from ssip_tpu.pipelines.extraction import _check_weights_match_arch

    r18_like = {
        "params": {
            f"layer{s}_{b}": {"conv1": {}, "conv2": {}}
            for s in (1, 2, 3, 4)
            for b in (0, 1)
        }
    }
    _check_weights_match_arch(r18_like, "resnet18", "w.pt")  # no raise
    with pytest.raises(ValueError, match="does not match --arch resnet50"):
        _check_weights_match_arch(r18_like, "resnet50", "w.pt")
    # resnet34 and resnet50 share stage sizes; bottleneck conv3 disambiguates
    r50_like = {
        "params": {
            f"layer{s + 1}_{b}": {"conv1": {}, "conv2": {}, "conv3": {}}
            for s, n in enumerate((3, 4, 6, 3))
            for b in range(n)
        }
    }
    _check_weights_match_arch(r50_like, "resnet50", "w.pt")  # no raise
    with pytest.raises(ValueError, match="does not match --arch resnet34"):
        _check_weights_match_arch(r50_like, "resnet34", "w.pt")


def test_sweep_defaults_resnet18_for_legacy_history(tmp_path):
    from ssip_tpu.pipelines.sweep import load_arch

    legacy = tmp_path / "training_history.json"
    legacy.write_text(json.dumps({"splits": {"train": [0]}}))
    assert load_arch(legacy) == "resnet18"

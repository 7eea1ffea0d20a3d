"""Pretrained-weight porting through the CLI surfaces."""

import json

import numpy as np
import torch

from src.feature_extraction import main as extraction_main
from tests.test_resnet_parity import TorchResNet18


def _write_checkpoint(path):
    torch.manual_seed(7)
    model = TorchResNet18(num_classes=1000)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    torch.save(model.state_dict(), path)


def test_extraction_with_ported_weights(tiny_image_tree, tmp_path):
    ckpt = tmp_path / "resnet18_imagenet1k.pt"
    _write_checkpoint(ckpt)

    out_ported = tmp_path / "out_ported"
    extraction_main(
        [
            "--data-dir", str(tiny_image_tree),
            "--device", "cpu",
            "--batch-size", "8",
            "--output-dir", str(out_ported),
            "--weights", str(ckpt),
            "--no-cache",
        ]
    )
    meta = json.loads((out_ported / "features" / "metadata.json").read_text())
    assert meta["weights"].startswith("ported:")
    ported = np.load(out_ported / "features" / "embeddings.npy")

    out_random = tmp_path / "out_random"
    extraction_main(
        [
            "--data-dir", str(tiny_image_tree),
            "--device", "cpu",
            "--batch-size", "8",
            "--output-dir", str(out_random),
            "--no-cache",
        ]
    )
    meta_r = json.loads((out_random / "features" / "metadata.json").read_text())
    assert meta_r["weights"].startswith("random_init:")
    random_emb = np.load(out_random / "features" / "embeddings.npy")

    # different weights must produce different embeddings; both finite
    assert not np.allclose(ported, random_emb)
    assert np.isfinite(ported).all()


def test_missing_weights_path_fails_loudly(tiny_image_tree, tmp_path):
    import pytest

    with pytest.raises(FileNotFoundError):
        extraction_main(
            [
                "--data-dir", str(tiny_image_tree),
                "--device", "cpu",
                "--output-dir", str(tmp_path / "o"),
                "--weights", str(tmp_path / "nope.pt"),
                "--no-cache",
            ]
        )


def test_supervised_with_pretrained_backbone(tiny_image_tree, tmp_path):
    from ssip_tpu.pipelines.supervised import build_classifier_state
    from ssip_tpu.pipelines.train_config import TrainingConfig

    ckpt = tmp_path / "ck.pt"
    _write_checkpoint(ckpt)
    cfg = TrainingConfig(
        strong_data_dir=tiny_image_tree / "avec_labels",
        image_size=32,
        pretrained_weights=ckpt,
    )
    state, _ = build_classifier_state(cfg, 2, 1e-4)
    # backbone came from the checkpoint (conv1 differs from host init)
    from ssip_tpu.models import ResNet18
    from ssip_tpu.models.host_init import seeded_init_host

    fresh = seeded_init_host(ResNet18(num_classes=2), cfg.seed, (1, 32, 32, 3))
    assert not np.allclose(
        np.asarray(state.params["conv1"]["kernel"]),
        fresh["params"]["conv1"]["kernel"],
    )
    # fc head stays freshly initialized (shape [512, 2], not the ckpt's 1000)
    assert np.asarray(state.params["fc"]["kernel"]).shape == (512, 2)
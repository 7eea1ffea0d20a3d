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

def test_cli_embeddings_match_torch_oracle_1e4(tiny_image_tree, tmp_path):
    """The 1e-4 parity bar enforced END-TO-END through the extraction CLI:
    embeddings from a ported checkpoint must match the torch oracle's
    forward over the reference preprocessing chain (Resize 256 → CenterCrop
    224 → normalize; reference feature_extraction.py:184-240, :251-313).
    BASELINE parity row — model-level 1e-4 is asserted elsewhere; this
    closes the loop over decode + resize + port + batching + artifacts.
    """
    from PIL import Image

    ckpt = tmp_path / "oracle.pt"
    _write_checkpoint(ckpt)

    out = tmp_path / "out_parity"
    extraction_main(
        [
            "--data-dir", str(tiny_image_tree),
            "--device", "cpu",
            "--batch-size", "8",
            "--compute-dtype", "float32",
            "--output-dir", str(out),
            "--weights", str(ckpt),
            "--no-cache",
        ]
    )
    ported = np.load(out / "features" / "embeddings.npy")
    import pandas as pd

    emb_paths = pd.read_csv(out / "features" / "embeddings.csv")["path"].tolist()

    # torch oracle forward over the SAME files in the CLI's order; the
    # transform is the reference chain rebuilt on PIL (no torchvision in
    # this env): bilinear short-side Resize(256) → CenterCrop(224) →
    # ToTensor → ImageNet normalize.
    torch.manual_seed(0)
    model = TorchResNet18(num_classes=1000)
    model.load_state_dict(torch.load(ckpt, weights_only=True))
    model.eval()

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def transform(img: Image.Image) -> torch.Tensor:
        w, h = img.size
        if w <= h:
            nw, nh = 256, round(256 * h / w)
        else:
            nw, nh = round(256 * w / h), 256
        arr = np.asarray(img.resize((nw, nh), Image.BILINEAR), np.float32)
        top, left = (nh - 224) // 2, (nw - 224) // 2
        arr = arr[top : top + 224, left : left + 224] / 255.0
        return torch.from_numpy(((arr - mean) / std).transpose(2, 0, 1))

    root = tiny_image_tree
    batch = torch.stack(
        [transform(Image.open(root / p)) for p in emb_paths]
    )  # extraction chain: NO .convert("RGB")
    with torch.no_grad():
        oracle = model(batch, features_only=True).numpy()

    assert ported.shape == oracle.shape
    max_abs = np.abs(ported - oracle).max()
    assert max_abs <= 1e-4, f"CLI embeddings off torch oracle by {max_abs}"

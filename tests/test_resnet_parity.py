"""Architecture + weight-porting parity: Flax ResNet-18 vs a torch oracle.

The oracle below is the standard torchvision BasicBlock ResNet topology,
written locally (torchvision is not installed in this environment). Ported
weights must produce embeddings within 1e-4 of the torch forward pass — the
BASELINE.md parity bar for the real IMAGENET1K_V1 checkpoint.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

from ssip_tpu.models import ResNet18
from ssip_tpu.models.port_torch import export_state_dict, port_state_dict


class TorchBasicBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_ch)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_ch, out_ch, 1, stride, bias=False),
                tnn.BatchNorm2d(out_ch),
            )
        self.relu = tnn.ReLU(inplace=True)

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + identity)


class TorchResNet18(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        in_ch = 64
        for i, w in enumerate(widths):
            blocks = []
            for b in range(2):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(TorchBasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{i+1}", tnn.Sequential(*blocks))
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(512, num_classes)

    def forward(self, x, features_only=False):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = torch.flatten(self.avgpool(x), 1)
        if features_only:
            return x
        return self.fc(x)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = TorchResNet18(num_classes=2)
    # randomize BN running stats so eval-mode parity actually exercises them
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return model


@pytest.fixture(scope="module")
def ported_variables(torch_model):
    state = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    return port_state_dict(state)


def test_port_covers_all_keys(torch_model, ported_variables):
    n_torch = sum(
        1 for k in torch_model.state_dict() if not k.endswith("num_batches_tracked")
    )
    def count(node):
        return sum(count(v) if isinstance(v, dict) else 1 for v in node.values())
    n_flax = count(ported_variables["params"]) + count(ported_variables["batch_stats"])
    assert n_flax == n_torch


def test_eval_forward_parity(torch_model, ported_variables):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, size=(4, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_logits = torch_model(torch.from_numpy(x)).numpy()
        ref_feats = torch_model(torch.from_numpy(x), features_only=True).numpy()

    model = ResNet18(num_classes=2)
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    logits, feats = model.apply(
        ported_variables, x_nhwc, train=False, return_features=True
    )
    np.testing.assert_allclose(np.asarray(feats), ref_feats, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=1e-4, rtol=1e-4)


def test_features_only_head(ported_variables):
    model = ResNet18(num_classes=None)
    variables = {
        "params": {k: v for k, v in ported_variables["params"].items() if k != "fc"},
        "batch_stats": ported_variables["batch_stats"],
    }
    x = np.zeros((2, 64, 64, 3), np.float32)
    feats = model.apply(variables, x, train=False)
    assert feats.shape == (2, 512)


def test_train_mode_bn_updates_match_torch(torch_model, ported_variables):
    """One train-mode forward: running stats must update with torch momentum 0.1."""
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, size=(8, 3, 64, 64)).astype(np.float32)

    tm = TorchResNet18(num_classes=2)
    tm.load_state_dict(torch_model.state_dict())
    tm.train()
    with torch.no_grad():
        tm(torch.from_numpy(x))
    ref_mean = tm.bn1.running_mean.numpy()
    ref_var = tm.bn1.running_var.numpy()

    model = ResNet18(num_classes=2)
    _, new_state = model.apply(
        ported_variables,
        np.transpose(x, (0, 2, 3, 1)),
        train=True,
        mutable=["batch_stats"],
    )
    got_mean = np.asarray(new_state["batch_stats"]["bn1"]["mean"])
    got_var = np.asarray(new_state["batch_stats"]["bn1"]["var"])
    np.testing.assert_allclose(got_mean, ref_mean, atol=1e-5)
    # torch uses unbiased batch variance for the running update
    np.testing.assert_allclose(got_var, ref_var, atol=1e-4, rtol=1e-4)


def test_export_roundtrip(torch_model, ported_variables):
    state = {k: v.numpy() for k, v in torch_model.state_dict().items()
             if not k.endswith("num_batches_tracked")}
    exported = export_state_dict(ported_variables)
    assert set(exported) == set(state)
    for k in state:
        np.testing.assert_array_equal(exported[k], state[k])

"""ResNet-50 (Bottleneck) parity vs a locally-written torch oracle."""

import numpy as np
import torch
import torch.nn as tnn

from ssip_tpu.models.port_torch import export_state_dict, port_state_dict
from ssip_tpu.models.resnet import ResNet50


class TorchBottleneck(tnn.Module):
    def __init__(self, in_ch, width, stride=1):
        super().__init__()
        out_ch = width * 4
        self.conv1 = tnn.Conv2d(in_ch, width, 1, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, out_ch, 1, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out_ch)
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
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + identity)


class TorchResNet50(tnn.Module):
    def __init__(self, num_classes=2):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        blocks_per_stage = [3, 4, 6, 3]
        in_ch = 64
        for i, (w, nb) in enumerate(zip(widths, blocks_per_stage)):
            blocks = []
            for b in range(nb):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(TorchBottleneck(in_ch, w, stride))
                in_ch = w * 4
            setattr(self, f"layer{i+1}", tnn.Sequential(*blocks))
        self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
        self.fc = tnn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


def test_resnet50_eval_parity():
    torch.manual_seed(0)
    tm = TorchResNet50(num_classes=2)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    tm.eval()

    state = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = port_state_dict(state)

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    model = ResNet50(num_classes=2)
    got = np.asarray(
        model.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)

    # roundtrip export covers bottleneck naming (conv3/bn3, downsample)
    exported = export_state_dict(variables)
    keys = {k for k in state if not k.endswith("num_batches_tracked")}
    assert set(exported) == keys

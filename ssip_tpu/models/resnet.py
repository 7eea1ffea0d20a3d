"""TPU-native ResNet (BasicBlock family) in Flax, torchvision-compatible.

The reference consumes ``torchvision.models.resnet18`` two ways: as a frozen
512-D feature extractor (reference: src/feature_extraction.py:210-227 — all
children but the final ``fc``, global-average-pooled) and as a 2-class
classifier with a fresh ``fc`` head (reference: src/training/common.py:299-304).
This module re-implements that topology natively for TPU:

- **NHWC layout** throughout — XLA's preferred conv layout on TPU (the MXU
  consumes the trailing channel axis directly; NCHW would force transposes).
- **bf16-friendly**: a ``compute_dtype`` knob casts activations while keeping
  params + BN statistics in f32 (mixed-precision convention).
- **Exact torchvision semantics** where parity matters: BN eps 1e-5, running
  stats with torch momentum 0.1, 7×7/2 stem with 3×3/2 max-pool (−inf
  padding), stride placement on each stage's first block, 1×1 downsample
  projections, global average pool over spatial axes, then ``fc``.

Weight porting from a torch ``state_dict`` lives in
``ssip_tpu.models.port_torch``; module/parameter names here are chosen so the
mapping is mechanical.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

# torchvision BasicBlock stage widths for resnet18/34.
RESNET18_STAGES: tuple[int, ...] = (2, 2, 2, 2)
RESNET34_STAGES: tuple[int, ...] = (3, 4, 6, 3)
STAGE_WIDTHS: tuple[int, ...] = (64, 128, 256, 512)

BN_EPS = 1e-5
# torch momentum 0.1 means running = 0.9*running + 0.1*batch;
# flax's convention is running = momentum*running + (1-momentum)*batch.
BN_MOMENTUM = 0.9


class BasicBlock(nn.Module):
    """Two 3×3 convs with identity (or 1×1-projected) residual."""

    features: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        needs_projection = (x.shape[-1] != self.features) or (self.stride != 1)

        identity = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.compute_dtype,
            name="conv1",
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, epsilon=BN_EPS, momentum=BN_MOMENTUM,
            dtype=self.compute_dtype, name="bn1",
        )(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(1, 1),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.compute_dtype,
            name="conv2",
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, epsilon=BN_EPS, momentum=BN_MOMENTUM,
            dtype=self.compute_dtype, name="bn2",
        )(y)

        if needs_projection:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.compute_dtype, name="downsample_conv",
            )(identity)
            identity = nn.BatchNorm(
                use_running_average=not train, epsilon=BN_EPS, momentum=BN_MOMENTUM,
                dtype=self.compute_dtype, name="downsample_bn",
            )(identity)

        return nn.relu(y + identity)


class ResNet(nn.Module):
    """BasicBlock ResNet (18/34 family), torchvision topology.

    ``num_classes=None`` yields the frozen-extractor head: global-average-
    pooled features (512-D for resnet18). Otherwise a Dense ``fc`` maps to
    logits — the classifier used by the training pipelines.
    """

    stage_sizes: Sequence[int] = RESNET18_STAGES
    num_classes: Optional[int] = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, *, train: bool = False, return_features: bool = False
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.compute_dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.compute_dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, epsilon=BN_EPS, momentum=BN_MOMENTUM,
            dtype=self.compute_dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1) pads with -inf.
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )

        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = BasicBlock(
                    STAGE_WIDTHS[stage], stride=stride,
                    compute_dtype=self.compute_dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)

        features = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool
        if self.num_classes is None:
            return features
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(features)
        if return_features:
            return logits, features
        return logits


def ResNet18(num_classes: Optional[int] = None, compute_dtype: Any = jnp.float32) -> ResNet:
    return ResNet(
        stage_sizes=RESNET18_STAGES, num_classes=num_classes, compute_dtype=compute_dtype
    )


# lowercase alias mirroring torchvision's factory naming
resnet18 = ResNet18


def ResNet34(num_classes: Optional[int] = None, compute_dtype: Any = jnp.float32) -> ResNet:
    return ResNet(
        stage_sizes=RESNET34_STAGES, num_classes=num_classes, compute_dtype=compute_dtype
    )

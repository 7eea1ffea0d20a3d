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

import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.ops.pool import stem_max_pool


def _s2d_stem_enabled(train: bool) -> bool:
    """Whether to run the stem as a space-to-depth conv.

    ``SSIP_S2D_STEM``: ``train-tpu`` (default) enables it for training on
    the TPU backend only. Two measured scope cuts:

    - inference: a ~2.5% LOSS on v5e (XLA already tiles the frozen stem
      well; models/inference.py:25-32 records the experiment), while the
      train step repeats the under-tiled stem forward+backward every step;
    - non-TPU backends: the reparametrized program makes XLA pick a
      different conv-backward lowering per mesh layout, and the resulting
      ~1e-7 re-association noise is chaos-amplified ~100×/epoch by the BN
      net — enough to break the device-count invariance suite's 1e-4
      epoch-0 bound (round-3 verdict; measured 2026-08-20: one CPU-mesh
      SGD step lands params 6.9e-5 apart between lowering variants while
      the s2d arithmetic itself agrees to 1e-7 single-device). The CPU
      test mesh therefore keeps the direct 7×7/2 conv unless forced.

    ``1`` forces it everywhere, ``0`` disables it, ``train`` restores the
    backend-agnostic train-only scope.
    """
    mode = os.environ.get("SSIP_S2D_STEM", "train-tpu")
    if mode == "1":
        return True
    if mode == "0":
        return False
    if mode == "train":
        return train
    return train and jax.default_backend() == "tpu"

# torchvision BasicBlock stage widths for resnet18/34.
RESNET18_STAGES: tuple[int, ...] = (2, 2, 2, 2)
RESNET34_STAGES: tuple[int, ...] = (3, 4, 6, 3)
STAGE_WIDTHS: tuple[int, ...] = (64, 128, 256, 512)

BN_EPS = 1e-5
# torch momentum 0.1 means running = 0.9*running + 0.1*batch;
# flax's convention is running = momentum*running + (1-momentum)*batch.
BN_MOMENTUM = 0.9


class MaskedBatchNorm(nn.Module):
    """BatchNorm2d with torch-exact semantics and optional batch-row masking.

    Differences from ``nn.BatchNorm`` that matter here:
      - an optional per-row ``mask`` excludes padded batch rows from the
        batch statistics (static batch shapes require padding the final
        partial batch; torch computes BN over exactly the valid rows);
      - the running-variance update uses the *unbiased* batch variance while
        normalization uses the biased one — torch.nn.BatchNorm2d's behavior.

    Parameter/collection names match ``nn.BatchNorm`` (params.scale/.bias,
    batch_stats.mean/.var) so torch porting and checkpoints are unaffected.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, use_running_average: bool, mask=None):
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(features, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))  # all but channel
            if mask is None:
                count = jnp.asarray(np.prod(x.shape[:-1]), jnp.float32)
                mean = jnp.mean(xf, axis=reduce_axes)
                var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
            else:
                w = mask.astype(jnp.float32).reshape(
                    (-1,) + (1,) * (x.ndim - 1)
                )  # [B,1,1,1]
                per_row = float(np.prod(x.shape[1:-1]))  # H*W
                count = jnp.maximum(jnp.sum(w) * per_row, 1.0)
                s1 = jnp.sum(xf * w, axis=reduce_axes)
                s2 = jnp.sum(jnp.square(xf) * w, axis=reduce_axes)
                mean = s1 / count
                var = s2 / count - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                unbiased = var * (count / jnp.maximum(count - 1.0, 1.0))
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * unbiased
                )

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.compute_dtype)


class StemConv(nn.Module):
    """torchvision's 7×7/2 stem conv, executed as a space-to-depth 4×4/1 conv.

    A 7×7 conv over 3 input channels uses 3 of the MXU's 128 contraction
    lanes — the single worst-utilized op in the network. The MLPerf-style
    space-to-depth reparametrization regroups the input into 2×2 pixel
    blocks ([N,H,W,3] → [N,H/2,W/2,12]) and rewrites the kernel so the same
    MACs run as a stride-1 4×4 conv over 12 channels: pixel index
    ``2m-3+a`` equals block ``2(m-2) + (a+1)``, so the 7 taps occupy 4
    blocks with one zero-padded tap, and pixel padding (3,3) becomes block
    padding (2,1).

    The *parameter* stays the torchvision-shaped ``kernel`` (7,7,C,64) with
    flax's stock initializer under the same ``conv1/kernel`` path —
    checkpoints, torch porting (models/port_torch.py) and seeded init are
    byte-identical either way; only the apply-time schedule changes (same
    arithmetic, re-associated — f32 agreement ~1e-6 rel).

    Default scope is TPU TRAINING ONLY (see ``_s2d_stem_enabled``): the
    frozen inference stem measured ~2.5% *slower* under s2d on v5e
    (models/inference.py:25-32), and on non-TPU backends the altered
    program shape triggers per-mesh conv-lowering differences whose fp
    noise breaks the device-count invariance bound — so eval and CPU/GPU
    keep the direct conv unless ``SSIP_S2D_STEM=1`` forces it. Odd
    spatial sizes always fall back.
    """

    features: int = 64
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, cin, self.features), jnp.float32,
        )
        x = x.astype(self.compute_dtype)
        k = kernel.astype(self.compute_dtype)
        n, h, w, _ = x.shape
        dn = ("NHWC", "HWIO", "NHWC")
        if not (_s2d_stem_enabled(train) and h % 2 == 0 and w % 2 == 0):
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn
            )
        xb = (
            x.reshape(n, h // 2, 2, w // 2, 2, cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * cin)
        )
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # 7 taps → 4 blocks
        kb = (
            kp.reshape(4, 2, 4, 2, cin, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * cin, self.features)
        )
        return jax.lax.conv_general_dilated(
            xb, kb, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn
        )


class BasicBlock(nn.Module):
    """Two 3×3 convs with identity (or 1×1-projected) residual."""

    features: int
    stride: int = 1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool, mask=None) -> jnp.ndarray:
        needs_projection = (x.shape[-1] != self.features) or (self.stride != 1)

        identity = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.compute_dtype,
            name="conv1",
        )(x)
        y = MaskedBatchNorm(compute_dtype=self.compute_dtype, name="bn1")(
            y, use_running_average=not train, mask=mask
        )
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(1, 1),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.compute_dtype,
            name="conv2",
        )(y)
        y = MaskedBatchNorm(compute_dtype=self.compute_dtype, name="bn2")(
            y, use_running_average=not train, mask=mask
        )

        if needs_projection:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.compute_dtype, name="downsample_conv",
            )(identity)
            identity = MaskedBatchNorm(
                compute_dtype=self.compute_dtype, name="downsample_bn"
            )(identity, use_running_average=not train, mask=mask)

        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """1×1 → 3×3 → 1×1 bottleneck (torchvision ResNet-50/101/152 block).

    torchvision places the stride on the 3×3 (its ``resnet`` uses
    stride-on-3x3 since v0.4 — the "ResNet v1.5" variant).
    """

    features: int  # bottleneck width; block output is 4× this
    stride: int = 1
    compute_dtype: Any = jnp.float32
    EXPANSION: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool, mask=None) -> jnp.ndarray:
        out_features = self.features * self.EXPANSION
        needs_projection = (x.shape[-1] != out_features) or (self.stride != 1)

        identity = x
        y = nn.Conv(
            self.features, (1, 1), strides=(1, 1), use_bias=False,
            dtype=self.compute_dtype, name="conv1",
        )(x)
        y = MaskedBatchNorm(compute_dtype=self.compute_dtype, name="bn1")(
            y, use_running_average=not train, mask=mask
        )
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.compute_dtype,
            name="conv2",
        )(y)
        y = MaskedBatchNorm(compute_dtype=self.compute_dtype, name="bn2")(
            y, use_running_average=not train, mask=mask
        )
        y = nn.relu(y)
        y = nn.Conv(
            out_features, (1, 1), strides=(1, 1), use_bias=False,
            dtype=self.compute_dtype, name="conv3",
        )(y)
        y = MaskedBatchNorm(compute_dtype=self.compute_dtype, name="bn3")(
            y, use_running_average=not train, mask=mask
        )

        if needs_projection:
            identity = nn.Conv(
                out_features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.compute_dtype, name="downsample_conv",
            )(identity)
            identity = MaskedBatchNorm(
                compute_dtype=self.compute_dtype, name="downsample_bn"
            )(identity, use_running_average=not train, mask=mask)

        return nn.relu(y + identity)


class ResNet(nn.Module):
    """torchvision-topology ResNet (BasicBlock 18/34, Bottleneck 50+).

    ``num_classes=None`` yields the frozen-extractor head: global-average-
    pooled features (512-D for resnet18). Otherwise a Dense ``fc`` maps to
    logits — the classifier used by the training pipelines.
    """

    stage_sizes: Sequence[int] = RESNET18_STAGES
    num_classes: Optional[int] = None
    compute_dtype: Any = jnp.float32
    bottleneck: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        return_features: bool = False,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray | tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.compute_dtype)
        x = StemConv(64, compute_dtype=self.compute_dtype, name="conv1")(
            x, train=train
        )
        x = MaskedBatchNorm(compute_dtype=self.compute_dtype, name="bn1")(
            x, use_running_average=not train, mask=mask
        )
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1) pads with -inf. Training
        # uses the fusion-friendly backward (ops/pool.py) — bit-identical
        # values and gradient routing, no SelectAndScatter; inference keeps
        # the stock reduce_window forward.
        if train:
            x = stem_max_pool(x)
        else:
            x = nn.max_pool(
                x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
            )

        block_cls = Bottleneck if self.bottleneck else BasicBlock
        for stage, num_blocks in enumerate(self.stage_sizes):
            for block in range(num_blocks):
                stride = 2 if (stage > 0 and block == 0) else 1
                x = block_cls(
                    STAGE_WIDTHS[stage], stride=stride,
                    compute_dtype=self.compute_dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train, mask=mask)

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


def ResNet50(num_classes: Optional[int] = None, compute_dtype: Any = jnp.float32) -> ResNet:
    return ResNet(
        stage_sizes=(3, 4, 6, 3), num_classes=num_classes,
        compute_dtype=compute_dtype, bottleneck=True,
    )


MODEL_FACTORIES = {
    "resnet18": ResNet18,
    "resnet34": ResNet34,
    "resnet50": ResNet50,
}
MODEL_STAGES = {
    "resnet18": RESNET18_STAGES,
    "resnet34": RESNET34_STAGES,
    "resnet50": (3, 4, 6, 3),
}

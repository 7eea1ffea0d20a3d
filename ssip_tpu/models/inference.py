"""Compiled fast-inference path for frozen ResNets: BN folding + s2d stem.

The frozen extractor (reference src/feature_extraction.py:210-227) never
updates BatchNorm, so at inference each BN collapses into an affine transform
that folds into the preceding conv — ``W' = W·γ/σ``, ``b' = β − μ·γ/σ`` —
removing every BN elementwise pass (pure HBM-bandwidth win on TPU).

The 7×7/2 stem conv reads only 3 input channels, starving the 128-lane MXU.
Zero-padding the kernel to 8×8 makes the stride-2 conv *exactly* equal to a
4×4 stride-1 VALID conv on the 2×2 space-to-depth transform of the padded
input (every multiply-add is identical; only reduction order may differ):

    out[p,q,o] = Σ_{kh<8,kw<8,c} x_pad[2p+kh, 2q+kw, c] · K8[kh,kw,c,o]
               = Σ_{a,b,k}      s2d(x_pad)[p+a, q+b, k] · K4[a,b,k,o]

with ``k = (di·2+dj)·C + c``, ``kh = 2a+di``, ``kw = 2b+dj``. The rewritten
stem has 12 input channels and ¼ the spatial positions — far better MXU
tiling (the standard MLPerf-ResNet TPU trick, rebuilt here from the algebra).

Folding happens once on host in float64; the returned apply function takes
the folded params as an ARGUMENT (never a closure — CLAUDE.md invariant) and
matches ``ResNet.apply(..., train=False)`` to fp tolerance
(tests/test_fast_inference.py).

**Measured outcome (v5e, batch 256, differenced)**: plain forward 30,967
imgs/s > folded-no-s2d 30,647 > folded+s2d 30,185. XLA already
constant-folds inference BN into the conv and tiles the stem well, so the
manual rewrite buys nothing on this hardware and the extra pad/transpose
HBM traffic of s2d costs ~2.5%. Extraction therefore defaults to the plain
forward (``ExtractionConfig.fast_inference=False``); this module remains
the measured record of the experiment and an option for backends where
XLA's fusion differs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.models.resnet import BN_EPS, RESNET18_STAGES, STAGE_WIDTHS

_DIMS = ("NHWC", "HWIO", "NHWC")


def _fold(kernel, bn_params, bn_stats) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BN(scale,bias,mean,var) into the preceding conv (f64 on host)."""
    k = np.asarray(kernel, np.float64)
    gamma = np.asarray(bn_params["scale"], np.float64)
    beta = np.asarray(bn_params["bias"], np.float64)
    mean = np.asarray(bn_stats["mean"], np.float64)
    var = np.asarray(bn_stats["var"], np.float64)
    g = gamma / np.sqrt(var + BN_EPS)
    return (k * g).astype(np.float32), (beta - mean * g).astype(np.float32)


def _s2d_kernel(k7: np.ndarray) -> np.ndarray:
    """[7,7,C,O] stride-2 kernel → [4,4,4C,O] space-to-depth equivalent."""
    kh, kw, c, o = k7.shape
    assert (kh, kw) == (7, 7), k7.shape
    k8 = np.zeros((8, 8, c, o), k7.dtype)
    k8[:7, :7] = k7
    # [2a+di, 2b+dj, c, o] → [a, b, (di·2+dj)·C + c, o]
    k4 = k8.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return np.ascontiguousarray(k4.reshape(4, 4, 4 * c, o))


def _space_to_depth(x: jax.Array) -> jax.Array:
    """[B,H,W,C] → [B,H/2,W/2,4C], channel order (di, dj, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _conv(x, kernel, bias, stride: int, padding) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMS,
    )
    return y + bias.astype(x.dtype)


def fold_resnet_extractor(
    variables: Dict[str, Any],
    stage_sizes: Sequence[int] = RESNET18_STAGES,
    bottleneck: bool = False,
    stem_s2d: bool = True,
) -> Dict[str, Any]:
    """Fold a ResNet's BN layers into conv weights; returns the folded pytree.

    ``variables`` is the flax dict from ``ResNet`` (params + batch_stats).
    """
    params, stats = variables["params"], variables["batch_stats"]

    k1, b1 = _fold(params["conv1"]["kernel"], params["bn1"], stats["bn1"])
    stem = {
        "kernel": jnp.asarray(_s2d_kernel(k1) if stem_s2d else k1),
        "bias": jnp.asarray(b1),
    }

    blocks: List[Dict[str, Any]] = []
    for stage in range(len(stage_sizes)):
        for block in range(stage_sizes[stage]):
            name = f"layer{stage + 1}_{block}"
            bp, bs = params[name], stats[name]
            convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
            folded: Dict[str, Any] = {}
            for conv in convs:
                bn = "bn" + conv[-1]
                k, b = _fold(bp[conv]["kernel"], bp[bn], bs[bn])
                folded[conv] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
            if "downsample_conv" in bp:
                k, b = _fold(
                    bp["downsample_conv"]["kernel"],
                    bp["downsample_bn"],
                    bs["downsample_bn"],
                )
                folded["downsample"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
            blocks.append(folded)
    return {"stem": stem, "blocks": blocks}


def make_folded_apply(
    stage_sizes: Sequence[int] = RESNET18_STAGES,
    bottleneck: bool = False,
    stem_s2d: bool = True,
    compute_dtype: Any = jnp.bfloat16,
) -> Callable[[Dict[str, Any], jax.Array], jax.Array]:
    """apply(folded, x_normalized_nhwc) → pooled features [B, D] float32.

    Semantically identical to ``ResNet.apply(variables, x, train=False)``
    with ``num_classes=None`` (structure must match ``fold_resnet_extractor``'s
    arguments). Not jitted here — callers jit/scan around it.
    """
    strides = []
    for stage in range(len(stage_sizes)):
        for block in range(stage_sizes[stage]):
            strides.append(2 if (stage > 0 and block == 0) else 1)

    def apply(folded: Dict[str, Any], x: jax.Array) -> jax.Array:
        x = x.astype(compute_dtype)
        stem = folded["stem"]
        if stem_s2d:
            x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
            x = _space_to_depth(x)
            x = _conv(x, stem["kernel"], stem["bias"], 1, "VALID")
        else:
            x = _conv(x, stem["kernel"], stem["bias"], 2, ((3, 3), (3, 3)))
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for folded_block, stride in zip(folded["blocks"], strides):
            identity = x
            if bottleneck:
                y = nn.relu(_conv(x, *_kb(folded_block["conv1"]), 1, "VALID"))
                y = nn.relu(
                    _conv(y, *_kb(folded_block["conv2"]), stride, ((1, 1), (1, 1)))
                )
                y = _conv(y, *_kb(folded_block["conv3"]), 1, "VALID")
            else:
                y = nn.relu(
                    _conv(x, *_kb(folded_block["conv1"]), stride, ((1, 1), (1, 1)))
                )
                y = _conv(y, *_kb(folded_block["conv2"]), 1, ((1, 1), (1, 1)))
            if "downsample" in folded_block:
                identity = _conv(x, *_kb(folded_block["downsample"]), stride, "VALID")
            x = nn.relu(y + identity)

        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)

    return apply


def _kb(d: Dict[str, jax.Array]) -> Tuple[jax.Array, jax.Array]:
    return d["kernel"], d["bias"]

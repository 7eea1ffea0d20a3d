"""Post-training int8 quantization for the frozen ResNet extractor.

TPU v5e's MXU runs s8×s8→s32 convolutions at ~2× its bf16 rate (measured
on-chip: 334–361 vs 181–192 TFLOP/s on the ≥128-channel ResNet layer
shapes; the 64-channel 56×56 layer gains ~nothing). This module exploits
that for the inference-only embedding workload (reference
src/feature_extraction.py:210-227 — frozen backbone, no gradients):

1. BN folds into each conv exactly as in ``models.inference`` (the frozen
   extractor never updates running stats);
2. folded weights are quantized **per output channel** symmetric int8
   (``s_w[o] = max|W[...,o]| / 127``);
3. activations are quantized **per tensor** symmetric int8 at each conv
   input, with static scales calibrated from one batch of real data
   (max-|x| over the calibration batch, f32 forward);
4. each conv site computes ``conv_s32(x_q, W_q) · (s_x·s_w) + b``;
   residual adds and ReLU run in f32, block-boundary activations
   materialize as ``inter_dtype`` (bf16 default), and **intra-block
   intermediates never leave int8** — the dequant-affine → ReLU →
   next-site quantize chain is one fused s32→s8 epilogue (``_requant``),
   so the tensor between two convs inside a block costs 1 byte/element
   of HBM traffic instead of a bf16 round-trip plus a quantize pass.

This is a **throughput mode, not a parity mode**: embeddings deviate from
the f32 chain by quantization noise (bounded and measured — cosine
similarity and NN-probe agreement are asserted in
tests/test_quantized.py and reported by the benchmark harness). The
reference has no analog; its closest notion is the AMP aspiration in
docs/presentation.md:151-153 ("150-250 imgs/s/GPU extraction (AMP)").
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.models.inference import _fold
from ssip_tpu.models.resnet import RESNET18_STAGES

_DIMS = ("NHWC", "HWIO", "NHWC")
_QMAX = 127.0


def _block_strides(stage_sizes: Sequence[int]) -> List[int]:
    return [
        2 if (stage > 0 and block == 0) else 1
        for stage in range(len(stage_sizes))
        for block in range(stage_sizes[stage])
    ]


def fold_f32_extractor(
    variables: Dict[str, Any],
    stage_sizes: Sequence[int] = RESNET18_STAGES,
    bottleneck: bool = False,
) -> Dict[str, Any]:
    """BN-folded f32 tree in this module's layout (stem + per-block convs).

    Same math as ``models.inference.fold_resnet_extractor`` (f64 fold on
    host) but without the s2d stem rewrite, and keeping numpy arrays so the
    quantizer can derive scales host-side.
    """
    params, stats = variables["params"], variables["batch_stats"]
    k1, b1 = _fold(params["conv1"]["kernel"], params["bn1"], stats["bn1"])
    tree: Dict[str, Any] = {"stem": {"kernel": k1, "bias": b1}, "blocks": []}
    for stage in range(len(stage_sizes)):
        for block in range(stage_sizes[stage]):
            name = f"layer{stage + 1}_{block}"
            bp, bs = params[name], stats[name]
            convs = ("conv1", "conv2", "conv3") if bottleneck else ("conv1", "conv2")
            folded: Dict[str, Any] = {}
            for conv in convs:
                bn = "bn" + conv[-1]
                k, b = _fold(bp[conv]["kernel"], bp[bn], bs[bn])
                folded[conv] = {"kernel": k, "bias": b}
            if "downsample_conv" in bp:
                k, b = _fold(
                    bp["downsample_conv"]["kernel"],
                    bp["downsample_bn"],
                    bs["downsample_bn"],
                )
                folded["downsample"] = {"kernel": k, "bias": b}
            tree["blocks"].append(folded)
    return tree


def _site_names(block: Dict[str, Any]) -> List[str]:
    names = [c for c in ("conv1", "conv2", "conv3") if c in block]
    if "downsample" in block:
        names.append("downsample")
    return names


def calibrate_act_scales(
    folded: Dict[str, Any],
    x: jax.Array,
    stage_sizes: Sequence[int] = RESNET18_STAGES,
    bottleneck: bool = False,
) -> Dict[str, Any]:
    """Per-conv-site input scales (max|x|/127) from one f32 forward.

    Mirrors the quantized forward's control flow exactly so every site's
    recorded input is the tensor the int8 path will quantize. Returns
    {"stem": s, "blocks": [{site: s, ...}, ...]} of python floats.
    """
    x = x.astype(jnp.float32)

    def scale(t: jax.Array) -> float:
        return float(jnp.max(jnp.abs(t))) / _QMAX or 1.0

    def conv_f32(t, site, stride, padding):
        y = jax.lax.conv_general_dilated(
            t, jnp.asarray(site["kernel"]), (stride, stride), padding,
            dimension_numbers=_DIMS,
        )
        return y + jnp.asarray(site["bias"])

    scales: Dict[str, Any] = {"stem": scale(x), "blocks": []}
    x = nn.relu(conv_f32(x, folded["stem"], 2, ((3, 3), (3, 3))))
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    for block, stride in zip(folded["blocks"], _block_strides(stage_sizes)):
        s: Dict[str, float] = {"conv1": scale(x)}
        identity = x
        if bottleneck:
            y = nn.relu(conv_f32(x, block["conv1"], 1, "VALID"))
            s["conv2"] = scale(y)
            y = nn.relu(conv_f32(y, block["conv2"], stride, ((1, 1), (1, 1))))
            s["conv3"] = scale(y)
            y = conv_f32(y, block["conv3"], 1, "VALID")
        else:
            y = nn.relu(conv_f32(x, block["conv1"], stride, ((1, 1), (1, 1))))
            s["conv2"] = scale(y)
            y = conv_f32(y, block["conv2"], 1, ((1, 1), (1, 1)))
        if "downsample" in block:
            s["downsample"] = s["conv1"]  # same input tensor as conv1
            identity = conv_f32(x, block["downsample"], stride, "VALID")
        x = nn.relu(y + identity)
        scales["blocks"].append(s)
    return scales


def quantize_extractor(
    variables: Dict[str, Any],
    calibration_batch: jax.Array,
    stage_sizes: Sequence[int] = RESNET18_STAGES,
    bottleneck: bool = False,
) -> Dict[str, Any]:
    """variables + one normalized [B,H,W,3] batch → int8 inference tree.

    Each conv site carries ``kernel`` (int8 [h,w,i,o]), ``mult`` (f32 [o] =
    s_x·s_w·1, the dequantization multiplier), ``bias`` (f32 [o]) and
    ``inv_in_scale`` (f32 scalar = 1/s_x for quantizing its input).
    """
    folded = fold_f32_extractor(variables, stage_sizes, bottleneck)
    scales = calibrate_act_scales(
        folded, calibration_batch, stage_sizes, bottleneck
    )

    def qsite(site: Dict[str, np.ndarray], s_x: float) -> Dict[str, Any]:
        k = np.asarray(site["kernel"], np.float64)
        s_w = np.max(np.abs(k), axis=(0, 1, 2)) / _QMAX
        s_w = np.where(s_w == 0.0, 1.0, s_w)
        k_q = np.clip(np.rint(k / s_w), -_QMAX, _QMAX).astype(np.int8)
        return {
            "kernel": jnp.asarray(k_q),
            "mult": jnp.asarray((s_x * s_w).astype(np.float32)),
            "bias": jnp.asarray(site["bias"], jnp.float32),
            "inv_in_scale": jnp.float32(1.0 / s_x),
        }

    tree: Dict[str, Any] = {
        "stem": qsite(folded["stem"], scales["stem"]),
        "blocks": [],
    }
    for block, s in zip(folded["blocks"], scales["blocks"]):
        tree["blocks"].append(
            {name: qsite(block[name], s[name]) for name in _site_names(block)}
        )
    return tree


def _quant(x: jax.Array, inv_scale: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)  # rounding in f32 regardless of inter_dtype
    return jnp.clip(jnp.round(x * inv_scale), -_QMAX, _QMAX).astype(jnp.int8)


def _qconv_raw(x_q: jax.Array, site: Dict[str, Any], stride: int, padding):
    """s8×s8→s32 conv, no dequant — epilogue chosen by the caller."""
    return jax.lax.conv_general_dilated(
        x_q,
        site["kernel"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIMS,
        preferred_element_type=jnp.int32,
    )


def _qconv(x_q: jax.Array, site: Dict[str, Any], stride: int, padding):
    """s8×s8→s32 conv + f32 per-channel dequant affine."""
    y32 = _qconv_raw(x_q, site, stride, padding)
    return y32.astype(jnp.float32) * site["mult"] + site["bias"]


def _requant(y32: jax.Array, site: Dict[str, Any], next_inv_scale: jax.Array):
    """Fused dequant-affine → ReLU → next-site quantize, s32 in, s8 out.

    One elementwise epilogue per intra-block intermediate instead of two
    (dequant → inter_dtype HBM round-trip → quantize): the activation
    between two conv sites that has no other consumer never materializes
    wider than int8. Quantizing from the f32 affine (instead of from the
    bf16 inter-site tensor) is strictly closer to the f32 oracle.
    """
    y = nn.relu(y32.astype(jnp.float32) * site["mult"] + site["bias"])
    return jnp.clip(jnp.round(y * next_inv_scale), -_QMAX, _QMAX).astype(jnp.int8)


def make_quantized_apply(
    stage_sizes: Sequence[int] = RESNET18_STAGES,
    bottleneck: bool = False,
    inter_dtype: Any = jnp.bfloat16,
    stem_prequantized: bool = False,
) -> Callable[[Dict[str, Any], jax.Array], jax.Array]:
    """apply(qtree, x_normalized_nhwc) → pooled features [B, D] f32.

    Control flow matches ``models.inference.make_folded_apply`` (itself
    matching ``ResNet.apply(..., train=False)``); only each conv's
    contraction runs int8. The dequant affine is computed in f32;
    activations are materialized between sites as ``inter_dtype``.
    bf16 inter-site (the default) halves the HBM traffic of the
    quantize/dequant passes — measured on v5e they, not the convs, bound
    this path — at the cost of bf16 rounding the bf16 *baseline* already
    carries; pass f32 for the most accurate variant.

    ``stem_prequantized``: the input is ALREADY the stem's int8 operand
    (quantized with ``stem.inv_in_scale`` upstream — the fused Pallas
    preproc epilogue does this on TPU, skipping one f32 HBM round-trip).
    """
    strides = _block_strides(stage_sizes)

    def _deq(y_f32: jax.Array) -> jax.Array:
        return y_f32.astype(inter_dtype)

    def apply(qtree: Dict[str, Any], x: jax.Array) -> jax.Array:
        stem = qtree["stem"]
        x_q = x if stem_prequantized else _quant(x, stem["inv_in_scale"])
        x = _qconv(x_q, stem, 2, ((3, 3), (3, 3)))
        x = _deq(nn.relu(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for block, stride in zip(qtree["blocks"], strides):
            # conv1 and downsample share the block input: quantize once.
            x_q = _quant(x, block["conv1"]["inv_in_scale"])
            identity = x
            if bottleneck:
                # intra-block intermediates have a single consumer (the next
                # conv): requantize s32→s8 in one fusion, never touching HBM
                # wider than int8.
                h_q = _requant(
                    _qconv_raw(x_q, block["conv1"], 1, "VALID"),
                    block["conv1"], block["conv2"]["inv_in_scale"],
                )
                h_q = _requant(
                    _qconv_raw(h_q, block["conv2"], stride, ((1, 1), (1, 1))),
                    block["conv2"], block["conv3"]["inv_in_scale"],
                )
                y = _qconv(h_q, block["conv3"], 1, "VALID")
            else:
                h_q = _requant(
                    _qconv_raw(x_q, block["conv1"], stride, ((1, 1), (1, 1))),
                    block["conv1"], block["conv2"]["inv_in_scale"],
                )
                y = _qconv(h_q, block["conv2"], 1, ((1, 1), (1, 1)))
            if "downsample" in block:
                identity = _qconv(x_q, block["downsample"], stride, "VALID")
            x = _deq(nn.relu(y + identity.astype(jnp.float32)))

        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))

    return apply

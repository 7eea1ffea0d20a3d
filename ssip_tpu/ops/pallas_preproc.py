"""Fused Pallas preprocessing kernel: uint8 image → normalized tensor.

One kernel program per image performs the whole deterministic extraction
chain in VMEM — resize (two MXU matmuls against triangle-filter weight
matrices, center-crop fused by pre-slicing the weights), PIL-faithful per-pass
uint8 quantization, and ImageNet normalization — writing the network-ready
tensor straight back to HBM. This removes the [B, H, 224, 3] intermediate
HBM round-trips the unfused XLA path would make and keeps the resample on the
MXU (cost: 2·crop·H·W MACs/channel ≈ 0.7 GFLOP/image at 512² — ~2% of chip
at the 5k imgs/sec target).

Semantics match ``ssip_tpu.ops.resize.extraction_preprocess`` exactly
(tested against it and against PIL in tests/test_preprocess.py); that XLA
path remains the portable fallback for CPU tests and odd image sizes.

Layout: channel-major [B, 3, H, W] in/out — (H, W) planes tile cleanly onto
(8,128) f32 VMEM tiles, whereas a trailing channel axis of 3 would waste
127/128 lanes. Callers transpose NHWC↔NCHW at the boundary (cheap, fused by
XLA into neighbors).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssip_tpu.ops.resize import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop_bounds,
    triangle_weights,
)


def _preproc_kernel(img_ref, wv_ref, wht_ref, out_ref, *, out_dtype):
    """img_ref: [1, 3, H, W] uint8; wv: [crop, H]; wht: [W, crop];
    out_ref: [1, 3, crop, crop] out_dtype."""
    wv = wv_ref[:]
    wht = wht_ref[:]
    for c in range(3):
        # Mosaic has no direct u8→f32 cast; stage through int32 (free on VPU).
        x = img_ref[0, c].astype(jnp.int32).astype(jnp.float32)
        # horizontal pass (W axis) + PIL per-pass uint8 clip
        t = jnp.dot(x, wht, preferred_element_type=jnp.float32)
        t = jnp.clip(jnp.floor(t + 0.5), 0.0, 255.0)
        # vertical pass (H axis)
        y = jnp.dot(wv, t, preferred_element_type=jnp.float32)
        y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)
        # ToTensor + Normalize epilogue — the SAME single-affine form as
        # ops.resize.normalize_imagenet_u8 ((x − 255·mean)·1/(255·std),
        # constants pre-rounded f64→f32), so kernel and XLA path round
        # identically: one subtract + one multiply, bitwise-stable under
        # any fusion/lowering.
        off = np.float32(255.0 * float(IMAGENET_MEAN[c]))
        sc = np.float32(1.0 / (255.0 * float(IMAGENET_STD[c])))
        out_ref[0, c] = ((y - off) * sc).astype(out_dtype)


def _preproc_quant_kernel(img_ref, wv_ref, wht_ref, inv_scale_ref, out_ref):
    """``_preproc_kernel`` + fused int8 activation quantization.

    Epilogue for the int8 PTQ embed path (models/quantized.py): the
    normalized f32 value quantizes with the stem conv's input scale
    (``clip(round(x·inv_s), ±127)``) INSIDE the kernel, so the [crop²×3]
    f32 tensor never round-trips HBM between preproc and the stem
    quantize pass — the output is the stem's int8 operand directly.
    Bit-identical to ``_quant(xla_preprocess(u8), inv_s)``
    (tests/test_quantized.py, interpret mode).
    """
    wv = wv_ref[:]
    wht = wht_ref[:]
    inv_s = inv_scale_ref[0]
    for c in range(3):
        x = img_ref[0, c].astype(jnp.int32).astype(jnp.float32)
        t = jnp.dot(x, wht, preferred_element_type=jnp.float32)
        t = jnp.clip(jnp.floor(t + 0.5), 0.0, 255.0)
        y = jnp.dot(wv, t, preferred_element_type=jnp.float32)
        y = jnp.clip(jnp.floor(y + 0.5), 0.0, 255.0)
        off = np.float32(255.0 * float(IMAGENET_MEAN[c]))
        sc = np.float32(1.0 / (255.0 * float(IMAGENET_STD[c])))
        v = (y - off) * sc
        out_ref[0, c] = jnp.clip(
            jnp.round(v * inv_s), -127.0, 127.0
        ).astype(jnp.int8)


@partial(
    jax.jit, static_argnames=("resize", "crop", "out_dtype", "interpret")
)
def preprocess_images_pallas(
    images_u8: jax.Array,
    resize: int = 256,
    crop: int = 224,
    out_dtype=jnp.float32,
    quant_inv_scale: jax.Array | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused extraction preprocess for a batch of NHWC uint8 images.

    Returns normalized NHWC ``out_dtype`` tensors of shape [B, crop, crop, 3].
    Requires square inputs (the MRI corpus is 512×512; non-square images take
    the XLA fallback in ``ops.resize``). With ``quant_inv_scale`` (a scalar
    f32 array) the output is instead int8 quantized activations for the PTQ
    embed path (``out_dtype`` is ignored).
    """
    b, h, w, c = images_u8.shape
    if c != 3 or h != w:
        raise ValueError(f"pallas preprocess expects square RGB NHWC, got {images_u8.shape}")
    if crop > resize:  # same guard as the XLA sibling (ops/resize.py) — a
        # negative-start weight slice would otherwise surface as an opaque
        # BlockSpec shape mismatch deep in pallas tracing
        raise ValueError(
            f"crop ({crop}) must be <= resize ({resize}): the resized "
            "short side cannot satisfy a larger center crop"
        )

    wv = triangle_weights(h, resize)[center_crop_bounds(resize, crop)]  # [crop, H]
    wht = triangle_weights(w, resize)[center_crop_bounds(resize, crop)].T  # [W, crop]

    x = jnp.transpose(images_u8, (0, 3, 1, 2))  # NHWC → NCHW

    in_specs = [
        pl.BlockSpec((1, 3, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((crop, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((w, crop), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if quant_inv_scale is not None:
        kernel = _preproc_quant_kernel
        out_dtype = jnp.int8
        in_specs.append(
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)
        )
        operands = (
            x, jnp.asarray(wv), jnp.asarray(wht),
            jnp.reshape(quant_inv_scale, (1,)).astype(jnp.float32),
        )
    else:
        kernel = partial(_preproc_kernel, out_dtype=out_dtype)
        operands = (x, jnp.asarray(wv), jnp.asarray(wht))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 3, crop, crop), out_dtype),
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 3, crop, crop), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 3 * (crop * h * w + crop * crop * h),
            bytes_accessed=b * (3 * h * w + 3 * crop * crop * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)

    return jnp.transpose(out, (0, 2, 3, 1))  # NCHW → NHWC

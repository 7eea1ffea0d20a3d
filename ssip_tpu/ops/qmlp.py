"""Fused int8 ViT MLP: quantize → s8·s8 GEMM → GELU requant → s8·s8 GEMM.

The round-4 int8 ViT trace (outputs/notes/profile_embed_int8_vit_b16.md)
showed the twelve per-layer MLP fusions running at 72 GB/s — pinned by
their f32 dequant→GELU→requant epilogues materializing the [B·S, mlp_dim]
hidden activations in HBM — which capped int8 PTQ at 1.10× bf16 even
though the s8 GEMMs themselves ran ~2× (docs/performance.md's Amdahl
analysis). This kernel is the fix that analysis prescribed: one grid step
takes a row block of the (already LayerNormed) stream and runs

    quantize(x)·W1q → dequant → exact-erf GELU → requantize → ·W2q → dequant

entirely in VMEM — the int32/f32 hidden never touches HBM, both weight
matrices stay VMEM-resident across the whole grid (constant index maps),
and HBM traffic collapses to the [M, D] stream in and the [M, D] result
out. Row blocks are image-agnostic (the MLP is row-independent), so the
kernel serves the flat padded [B·S_pad, D] stream layout directly.

Bitwise contract: every op matches the unfused int8 path in
``models/quantized_vit.py`` (same ``round→clip→int8`` quantization, exact
integer GEMM accumulation, same f32 dequant affine and erf GELU), so the
fused and unfused paths agree except for elementwise f32 rounding — the
interpret-mode test asserts near-exact equality.

The XLA path (the unfused site composition) remains the portable
reference: CPU/GPU always use it and ``SSIP_QMLP_PALLAS=0`` forces it on
TPU (same escape-hatch convention as SSIP_ATTN_PALLAS / SSIP_LN_PALLAS).

Reference anchor: the reference has no quantization and no ViT (its model
surface is torchvision resnet18 — reference src/training/common.py:299-304);
this op serves the TPU-extra ``--compute-dtype int8 --arch vit_*`` mode.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_QMAX = 127.0
_INV_SQRT2 = 0.7071067811865476
# Abramowitz & Stegun 7.1.26 rational-polynomial erf: |error| ≤ 1.5e-7
_ERF_P = 0.3275911
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


def _erf_poly(z: jax.Array) -> jax.Array:
    """f32 erf via A&S 7.1.26 (odd extension). Mosaic lowers neither
    ``erf`` nor ``erfc`` (the primitives behind jax.nn.gelu/lax.erf), so
    the kernel needs its own — exp/mul/add only, all VPU-supported."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + np.float32(_ERF_P) * z)
    a0, a1, a2, a3, a4 = (np.float32(a) for a in _ERF_A)
    poly = ((((a4 * t + a3) * t + a2) * t + a1) * t + a0) * t
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_erf(x: jax.Array) -> jax.Array:
    """Erf-form GELU on the polynomial erf. Used by BOTH the kernel and
    the XLA fallback so the two int8 paths stay op-for-op identical; the
    ≤1.5e-7 erf error is far below the int8 requant step that follows
    (the accuracy envelope vs the true-erf f32 chain is pinned in
    tests/test_quantized_vit.py)."""
    x = x.astype(jnp.float32)
    return 0.5 * x * (1.0 + _erf_poly(x * np.float32(_INV_SQRT2)))
# rows per grid step: 256×mlp_dim f32 temporaries + both int8 weight
# matrices stay inside ~16 MB VMEM for every shipped config (ViT-B/16:
# 2×[256,3072] f32 + 2.25+2.25 MB weights ≈ 11 MB)
_ROW_BLOCK = 256


def _qmlp_kernel(
    y_ref, w1_ref, m1_ref, b1_ref, w2_ref, m2_ref, b2_ref, s_ref, o_ref
):
    """One [R, D] row block; hidden activations live and die in VMEM."""
    inv1 = s_ref[0, 0]
    inv2 = s_ref[0, 1]
    y = y_ref[:].astype(jnp.float32)
    xq = jnp.clip(jnp.round(y * inv1), -_QMAX, _QMAX).astype(jnp.int8)
    h32 = jax.lax.dot_general(
        xq, w1_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = h32.astype(jnp.float32) * m1_ref[0] + b1_ref[0]
    g = _gelu_erf(h)
    gq = jnp.clip(jnp.round(g * inv2), -_QMAX, _QMAX).astype(jnp.int8)
    o32 = jax.lax.dot_general(
        gq, w2_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (o32.astype(jnp.float32) * m2_ref[0] + b2_ref[0]).astype(
        o_ref.dtype
    )


@partial(jax.jit, static_argnames=("interpret",))
def _qmlp_pallas(y2d, w1, m1, b1, w2, m2, b2, scales, interpret: bool = False):
    m, d = y2d.shape
    hdim = w1.shape[1]
    grid = (pl.cdiv(m, _ROW_BLOCK),)
    row_spec = pl.BlockSpec(
        (_ROW_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _qmlp_kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), jnp.float32),
        grid=grid,
        in_specs=[
            row_spec,
            const((d, hdim)),
            const((1, hdim)),
            const((1, hdim)),
            const((hdim, d)),
            const((1, d)),
            const((1, d)),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (_ROW_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            # two s8 GEMMs; bytes: stream in + f32 out + the two weight
            # matrices fetched once (amortized estimate)
            flops=4 * m * d * hdim,
            bytes_accessed=m * d * (y2d.dtype.itemsize + 4) + 2 * d * hdim,
            transcendentals=m * hdim,
        ),
        interpret=interpret,
    )(y2d, w1, m1, b1, w2, m2, b2, scales)


def quantized_mlp_xla(y: jax.Array, blk: dict) -> jax.Array:
    """Portable unfused reference: the exact site composition of
    models/quantized_vit.py (quant → s8 dot → dequant per site, f32 GELU
    between) — the path CPU/GPU run and the kernel is tested against."""
    from ssip_tpu.models.quantized_vit import _qdense, _quant

    h = _qdense(_quant(y, blk["mlp_1"]["inv_in_scale"]), blk["mlp_1"])
    g = _gelu_erf(h)
    return _qdense(_quant(g, blk["mlp_2"]["inv_in_scale"]), blk["mlp_2"])


def quantized_mlp(
    y: jax.Array,
    blk: dict,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused int8 MLP over a [M, D] (or [..., D]) stream block.

    ``blk``: one encoder block's quantized site tree (``mlp_1``/``mlp_2``
    each with int8 ``kernel``, f32 ``mult``/``bias``/``inv_in_scale`` —
    models/quantized_vit.py:quantize_vit_extractor). Returns f32, like the
    unfused ``_qdense`` epilogue.
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("SSIP_QMLP_PALLAS", "1") != "0"
        )
    if interpret:
        use_pallas = True
    if not use_pallas:
        return quantized_mlp_xla(y, blk)
    shape = y.shape
    y2d = y.reshape(-1, shape[-1])
    scales = jnp.stack(
        [blk["mlp_1"]["inv_in_scale"], blk["mlp_2"]["inv_in_scale"]]
    ).reshape(1, 2).astype(jnp.float32)
    out = _qmlp_pallas(
        y2d,
        blk["mlp_1"]["kernel"],
        blk["mlp_1"]["mult"].reshape(1, -1),
        blk["mlp_1"]["bias"].reshape(1, -1),
        blk["mlp_2"]["kernel"],
        blk["mlp_2"]["mult"].reshape(1, -1),
        blk["mlp_2"]["bias"].reshape(1, -1),
        scales,
        interpret=interpret,
    )
    return out.reshape(shape[:-1] + (out.shape[-1],))

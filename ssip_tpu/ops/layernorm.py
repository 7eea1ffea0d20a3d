"""Fused LayerNorm for the ViT family (Pallas TPU + XLA fallback).

The round-3 TPU profile (outputs/notes/profile_embed_vit_b16.md) showed the
flax ``nn.LayerNorm(dtype=f32)`` discipline — ``x.astype(f32) → LN →
.astype(bf16)`` per encoder sublayer — materializing a full f32 copy of the
[B, S, D] stream per LayerNorm: eleven identical ``convert_reduce_fusion``
ops at 61 GB/s eating ~30% of device time, plus follow-on output fusions.
The stream is bf16-resident everywhere else, so each LN paid ~3× its
speed-of-light HBM traffic.

This kernel normalizes in ONE pass: read the bf16 block, compute f32
moments in-register, write the bf16 result — 4 bytes/element total, no
materialized f32 activations. The backward recomputes the row statistics
from the saved input (cheaper than staging [N] stats through HBM at these
sizes, and the same recompute philosophy as ops/attention.py's VJP) and
emits per-block partial ``dscale``/``dbias`` that the caller sums.

The XLA path is the portable reference: CPU/GPU always use it, tests assert
the kernel against it in interpret mode, and ``SSIP_LN_PALLAS=0`` forces it
on TPU (same escape-hatch convention as SSIP_ATTN_PALLAS).

Reference anchor: the reference has no LayerNorm anywhere (its model is a
BN CNN — reference src/training/common.py:299-304); this op serves the
TPU-extra ViT/MoE backbone families (ssip_tpu.models.vit / .moe).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid block: multiple of every dtype's sublane tile (32 covers
# int8/fp8 too); 256×768 f32 temporaries stay well inside VMEM
_ROW_BLOCK = 256


def layer_norm_xla(
    x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float
) -> jax.Array:
    """Reference LayerNorm over the last axis; f32 math, input-dtype out."""
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - m
    v = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(v + eps) * scale + bias
    return y.astype(x.dtype)


def _ln_fwd_kernel(x_ref, s_ref, b_ref, o_ref, *, eps: float):
    """One [R, D] row block: f32 moments in-register, bf16 in/out."""
    x = x_ref[:].astype(jnp.float32)
    m = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - m
    v = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(v + np.float32(eps)) * s_ref[0] + b_ref[0]
    o_ref[:] = y.astype(o_ref.dtype)


def _ln_bwd_kernel(
    x_ref, s_ref, dy_ref, dx_ref, ds_ref, db_ref, *, eps: float, n_rows: int
):
    """Backward for one row block; stats recomputed from x.

    Rows past ``n_rows`` (the final partial block) are zeroed before any
    sum so they cannot contaminate the dscale/dbias partials; their dx
    rows are garbage that Pallas's out-of-bounds store masking discards.
    """
    i = pl.program_id(0)
    rows = x_ref.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) + i * rows
    ok = row < n_rows
    x = jnp.where(ok, x_ref[:].astype(jnp.float32), 0.0)
    dy = jnp.where(ok, dy_ref[:].astype(jnp.float32), 0.0)
    m = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - m
    v = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(v + np.float32(eps))
    xhat = xc * r
    g = dy * s_ref[0]
    mg = jnp.mean(g, axis=-1, keepdims=True)
    mgx = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dx_ref[:] = (r * (g - mg - xhat * mgx)).astype(dx_ref.dtype)
    # The partials buffer is one full [blocks, D] VMEM block shared by every
    # grid step (constant index map): a per-step (1, D) block would need an
    # 8-divisible-or-full first dim, which an arbitrary block count is not
    # (Mosaic rejected (1, 384) over (99, 384) — first hit by the ViT-S/16
    # train step, whose 128·197-row stream yields 99 blocks). Each step
    # writes exactly its own row; TPU grid steps run sequentially.
    ds_ref[pl.ds(i, 1)] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    db_ref[pl.ds(i, 1)] = jnp.sum(dy, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_pallas_fwd(x2d, scale, bias, eps: float, interpret: bool):
    n, d = x2d.shape
    grid = (pl.cdiv(n, _ROW_BLOCK),)
    row_spec = pl.BlockSpec(
        (_ROW_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_ln_fwd_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((n, d), x2d.dtype),
        grid=grid,
        in_specs=[row_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        cost_estimate=pl.CostEstimate(
            flops=8 * n * d,
            bytes_accessed=2 * n * d * x2d.dtype.itemsize,
            transcendentals=n,
        ),
        interpret=interpret,
    )(x2d, scale.reshape(1, d), bias.reshape(1, d))


@partial(jax.jit, static_argnames=("eps", "interpret"))
def _ln_pallas_bwd(x2d, scale, dy, eps: float, interpret: bool):
    n, d = x2d.shape
    blocks = pl.cdiv(n, _ROW_BLOCK)
    row_spec = pl.BlockSpec(
        (_ROW_BLOCK, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    vec_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec(
        (blocks, d), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    dx, ds_part, db_part = pl.pallas_call(
        partial(_ln_bwd_kernel, eps=eps, n_rows=n),
        out_shape=(
            jax.ShapeDtypeStruct((n, d), x2d.dtype),
            jax.ShapeDtypeStruct((blocks, d), jnp.float32),
            jax.ShapeDtypeStruct((blocks, d), jnp.float32),
        ),
        grid=(blocks,),
        in_specs=[row_spec, vec_spec, row_spec],
        out_specs=(row_spec, part_spec, part_spec),
        cost_estimate=pl.CostEstimate(
            flops=20 * n * d,
            bytes_accessed=3 * n * d * x2d.dtype.itemsize,
            transcendentals=n,
        ),
        interpret=interpret,
    )(x2d, scale.reshape(1, d), dy)
    return dx, jnp.sum(ds_part, axis=0), jnp.sum(db_part, axis=0)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln_fused(x2d, scale, bias, eps, interpret):
    return _ln_pallas_fwd(x2d, scale, bias, eps, interpret)


def _ln_fused_fwd(x2d, scale, bias, eps, interpret):
    return _ln_pallas_fwd(x2d, scale, bias, eps, interpret), (x2d, scale)


def _ln_fused_bwd(eps, interpret, res, dy):
    x2d, scale = res
    dx, dscale, dbias = _ln_pallas_bwd(x2d, scale, dy, eps, interpret)
    return dx, dscale, dbias


_ln_fused.defvjp(_ln_fused_fwd, _ln_fused_bwd)


def layer_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-6,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis; Pallas-fused on TPU, XLA elsewhere.

    Returns ``x.dtype`` (callers cast the result where the consumer needs a
    different precision — the GEMM input stays bf16, the final feature head
    upcasts to f32).
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("SSIP_LN_PALLAS", "1") != "0"
        )
    if interpret:
        use_pallas = True
    if not use_pallas:
        return layer_norm_xla(x, scale, bias, eps)
    d = x.shape[-1]
    y2d = _ln_fused(
        x.reshape(-1, d),
        scale.astype(jnp.float32),
        bias.astype(jnp.float32),
        float(eps),
        interpret,
    )
    return y2d.reshape(x.shape)

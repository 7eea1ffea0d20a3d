"""Fused multi-head attention for the ViT family (Pallas TPU + XLA fallback).

XLA has no flash-style attention fusion: the unfused path materializes the
[B, H, S, S] attention-probability tensor in HBM twice per layer (softmax
write + second-matmul read). At ViT-B/224 (S=197, 12 heads, 12 layers) that
is the dominant non-matmul HBM traffic of the encoder. The Pallas kernel
keeps one (batch, head)'s whole score matrix in VMEM — QK^T, masked softmax,
and PV run back-to-back on the MXU/VPU with only Q/K/V/O touching HBM.

ViT sequences are short (197 tokens at 224²/16), so one VMEM-resident block
per (batch, head) is the right shape — no online-softmax tiling needed. The
kernel pads S to the 128-lane boundary and masks padded KEYS to -1e30 before
the softmax; padded QUERY rows compute garbage that the caller slices off.
Sequences longer than ``_MAX_FUSED_SEQ`` fall back to the XLA path (their
score matrix would not fit VMEM; none of our models hit this).

The XLA path is the portable reference: CPU/GPU always use it, tests assert
the kernel against it in interpret mode, and ``SSIP_ATTN_PALLAS=0`` forces
it on TPU (the same escape-hatch convention as SSIP_ROTATE_BLOCKED).

Reference anchor: the reference has no attention anywhere (its model is a
CNN — reference src/training/common.py:299-304); this op exists for the
TPU-extra ViT backbone family (ssip_tpu.models.vit).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# beyond this padded length the [S, S] f32 score block (S² · 4 bytes) plus
# q/k/v/o no longer sits comfortably in ~16 MB VMEM
_MAX_FUSED_SEQ = 1024
_NEG_INF = np.float32(-1e30)  # finite: keeps max-subtraction NaN-free


def attention_xla(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference scaled-dot-product attention.

    q, k, v: [B, H, S, Dh] (any float dtype). Scores and softmax run in f32
    (the MXU accumulates f32 regardless; this pins the VPU math too), the
    PV matmul takes the probabilities back at the input dtype.
    """
    dh = q.shape[-1]
    scale = np.float32(1.0 / np.sqrt(dh))
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_len: int, scale: float):
    """One (batch·head): q/k/v_ref [1, S_pad, Dh]; o_ref [1, S_pad, Dh]."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    # contract the Dh axes directly — no VMEM transpose of k
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * np.float32(scale)
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


@partial(jax.jit, static_argnames=("interpret",))
def _attention_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    b, h, s, dh = q.shape
    s_pad = max(128, -(-s // 128) * 128)

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return x.reshape(b * h, s_pad, dh)

    qp, kp, vp = prep(q), prep(k), prep(v)
    spec = pl.BlockSpec(
        (1, s_pad, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        partial(_attn_kernel, kv_len=s, scale=1.0 / float(np.sqrt(dh))),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, dh), q.dtype),
        grid=(b * h,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s_pad * s_pad * dh,
            bytes_accessed=4 * b * h * s_pad * dh * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(b, h, s_pad, dh)[:, :, :s, :]


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, kv_len: int, scale: float,
):
    """Backward for one (batch·head) block, all residents in VMEM.

    Recomputes the probability matrix (cheaper than writing [S, S] f32 to
    HBM in the forward) and applies the standard softmax-attention VJP:
    dV = Pᵀ·dO, dP = dO·Vᵀ, dS = P ⊙ (dP − rowsum(dP ⊙ P)),
    dQ = s·dS·K, dK = s·dSᵀ·Q. Padded query rows carry dO = 0 so their dS
    rows vanish; padded key columns carry P = 0 so their dK/dV rows vanish —
    no extra masking beyond the forward's key mask is needed.
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * np.float32(scale)
    key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(key_idx < kv_len, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    # contract the query axes directly — no VMEM transposes
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * np.float32(scale)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * np.float32(scale)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@partial(jax.jit, static_argnames=("interpret",))
def _attention_pallas_bwd(
    q: jax.Array, k: jax.Array, v: jax.Array, do: jax.Array,
    interpret: bool = False,
):
    b, h, s, dh = q.shape
    s_pad = max(128, -(-s // 128) * 128)

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return x.reshape(b * h, s_pad, dh)

    spec = pl.BlockSpec(
        (1, s_pad, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    shape = jax.ShapeDtypeStruct((b * h, s_pad, dh), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, kv_len=s, scale=1.0 / float(np.sqrt(dh))),
        out_shape=(shape, shape, shape),
        grid=(b * h,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * s_pad * s_pad * dh,
            bytes_accessed=7 * b * h * s_pad * dh * q.dtype.itemsize,
            transcendentals=b * h * s_pad * s_pad,
        ),
        interpret=interpret,
    )(prep(q), prep(k), prep(v), prep(do))

    def post(x):
        return x.reshape(b, h, s_pad, dh)[:, :, :s, :]

    return post(dq), post(dk), post(dv)


# pallas_call has no autodiff rule, so the fused path is wrapped in a
# custom VJP whose backward is a second single-block kernel (the [S, S]
# probability matrix is recomputed in VMEM, never staged through HBM) —
# ViT/MoE *training* on TPU differentiates straight through this.
@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attention_fused(q, k, v, interpret=False):
    return _attention_pallas(q, k, v, interpret=interpret)


def _attention_fused_fwd(q, k, v, interpret):
    return _attention_pallas(q, k, v, interpret=interpret), (q, k, v)


def _attention_fused_bwd(interpret, res, do):
    q, k, v = res
    return _attention_pallas_bwd(q, k, v, do, interpret=interpret)


_attention_fused.defvjp(_attention_fused_fwd, _attention_fused_bwd)


def _head_cols(x, h: int, dh: int, j: int, d: int):
    """Static lane-slice of head ``h``'s q/k/v (j=0/1/2) columns.

    Kept at the input dtype: the MXU accumulates f32 regardless
    (``preferred_element_type``), and bf16 operands run the systolic array
    at full rate where an up-front f32 cast would halve it — the exact
    operand/accumulator split ``attention_xla`` uses, so parity holds.
    """
    c0 = j * d + h * dh
    return jax.lax.slice_in_dim(x, c0, c0 + dh, axis=1)


def _attn_qkv_kernel(qkv_ref, o_ref, *, num_heads: int, scale: float, kv_len: int):
    """One batch image: qkv_ref [1, S, 3D] packed ([3, H, Dh] columns).

    Heads unroll as a static loop with 64-lane static slices — all VMEM
    ops, no DMA-side head transposes. Mosaic's block rules require the
    trailing block dims to be 8/128-divisible OR the full array dims; the
    full [S, 3D] face satisfies the latter for any S (197 included), so no
    padding is needed — the logical S is exact. When the caller's stream
    IS padded (the flat [B·S_pad, D] encoder layout in models/vit.py),
    ``kv_len < S`` masks the pad KEYS to -1e30 before the softmax: their
    probabilities underflow to exactly 0.0, so real rows' outputs match
    the unpadded kernel to fp-reduction-order tolerance; pad QUERY rows
    compute finite garbage the caller never reads.
    """
    x = qkv_ref[0]
    s_dim = x.shape[0]
    d = x.shape[1] // 3
    dh = d // num_heads
    for h in range(num_heads):
        q = _head_cols(x, h, dh, 0, d)
        k = _head_cols(x, h, dh, 1, d)
        v = _head_cols(x, h, dh, 2, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * np.float32(scale)
        if kv_len < s_dim:
            key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(key_idx < kv_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, :, h * dh : (h + 1) * dh] = jnp.dot(
            p.astype(x.dtype), v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _attn_qkv_bwd_kernel(
    qkv_ref, do_ref, dqkv_ref, *, num_heads: int, scale: float, kv_len: int
):
    """Backward for one batch image off the packed layout; probabilities
    recomputed in VMEM (same VJP algebra as ``_attn_bwd_kernel``; with
    ``kv_len < S`` the same key mask as the forward re-applies, so pad
    keys carry p = 0 and their dk/dv rows vanish). Writes the packed dqkv
    block directly, so the VJP needs no repacking copy."""
    x = qkv_ref[0]
    s_dim = x.shape[0]
    d = x.shape[1] // 3
    dh = d // num_heads
    for h in range(num_heads):
        q = _head_cols(x, h, dh, 0, d)
        k = _head_cols(x, h, dh, 1, d)
        v = _head_cols(x, h, dh, 2, d)
        do = do_ref[0, :, h * dh : (h + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * np.float32(scale)
        if kv_len < s_dim:
            key_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(key_idx < kv_len, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pc = p.astype(x.dtype)
        dv = jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(x.dtype)
        dq = jnp.dot(dsc, k, preferred_element_type=jnp.float32) * np.float32(scale)
        dk = jax.lax.dot_general(
            dsc, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * np.float32(scale)
        dqkv_ref[0, :, h * dh : (h + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, d + h * dh : d + (h + 1) * dh] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * d + h * dh : 2 * d + (h + 1) * dh] = dv.astype(
            dqkv_ref.dtype
        )


@partial(jax.jit, static_argnames=("num_heads", "kv_len", "interpret"))
def _attention_qkv_pallas(
    qkv, num_heads: int, kv_len: int = 0, interpret: bool = False
):
    b, s, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    return pl.pallas_call(
        partial(
            _attn_qkv_kernel, num_heads=num_heads,
            scale=1.0 / float(np.sqrt(dh)), kv_len=kv_len or s,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, s, three_d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, s, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * s * s * dh,
            bytes_accessed=4 * b * s * d * qkv.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
        interpret=interpret,
    )(qkv)


@partial(jax.jit, static_argnames=("num_heads", "kv_len", "interpret"))
def _attention_qkv_pallas_bwd(
    qkv, do, num_heads: int, kv_len: int = 0, interpret: bool = False
):
    b, s, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    return pl.pallas_call(
        partial(
            _attn_qkv_bwd_kernel,
            num_heads=num_heads,
            scale=1.0 / float(np.sqrt(dh)),
            kv_len=kv_len or s,
        ),
        out_shape=jax.ShapeDtypeStruct((b, s, three_d), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, s, three_d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s, d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, s, three_d), lambda bi: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * s * s * dh,
            bytes_accessed=7 * b * s * d * qkv.dtype.itemsize,
            transcendentals=b * num_heads * s * s,
        ),
        interpret=interpret,
    )(qkv, do)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _attention_qkv_fused(qkv, num_heads, kv_len=0, interpret=False):
    return _attention_qkv_pallas(qkv, num_heads, kv_len=kv_len, interpret=interpret)


def _attention_qkv_fused_fwd(qkv, num_heads, kv_len, interpret):
    return (
        _attention_qkv_pallas(qkv, num_heads, kv_len=kv_len, interpret=interpret),
        (qkv,),
    )


def _attention_qkv_fused_bwd(num_heads, kv_len, interpret, res, do):
    (qkv,) = res
    return (
        _attention_qkv_pallas_bwd(
            qkv, do, num_heads, kv_len=kv_len, interpret=interpret
        ),
    )


_attention_qkv_fused.defvjp(_attention_qkv_fused_fwd, _attention_qkv_fused_bwd)


def attention_qkv_xla(
    qkv: jax.Array, num_heads: int, kv_len: int = 0
) -> jax.Array:
    """Portable packed-qkv attention: unpack → attention_xla → repack.

    ``kv_len``: with a padded stream, keys/values beyond ``kv_len`` are
    sliced off (equivalent to the Pallas kernel's -inf key mask); all
    query rows still produce output rows.
    """
    b, s, three_d = qkv.shape
    d = three_d // 3
    dh = d // num_heads
    parts = qkv.reshape(b, s, 3, num_heads, dh)
    q, k, v = (jnp.transpose(parts[:, :, i], (0, 2, 1, 3)) for i in range(3))
    if kv_len and kv_len < s:
        k = k[:, :, :kv_len]
        v = v[:, :, :kv_len]
    o = attention_xla(q, k, v)
    return jnp.transpose(o, (0, 2, 1, 3)).reshape(b, s, d)


def fused_attention_qkv(
    qkv: jax.Array,
    num_heads: int,
    *,
    kv_len: int = 0,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention straight off the packed qkv GEMM output.

    ``qkv``: [B, S, 3·D] with columns ordered [3, H, Dh] (the fused Dense
    in models/vit.py). Returns [B, S, D]. On TPU the Pallas kernel takes
    one image's full [S, 3D] face per grid step (full-array trailing dims
    are always a legal Mosaic block, any S) and unrolls heads in-kernel
    with static 64-lane column slices — the [B,S,H,Dh]→[B,H,S,Dh]
    transposes and the pad-to-128 copies of the unpacked path never exist
    (they were the 15.2% "data formatting" share of the round-3 embed
    profile, outputs/notes/profile_embed_vit_b16.md).
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("SSIP_ATTN_PALLAS", "1") != "0"
        )
    if interpret:
        use_pallas = True
    if use_pallas and qkv.shape[1] <= _MAX_FUSED_SEQ:
        return _attention_qkv_fused(qkv, num_heads, kv_len, interpret)
    return attention_qkv_xla(qkv, num_heads, kv_len=kv_len)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Multi-head attention, Pallas-fused on TPU, XLA elsewhere.

    ``use_pallas=None`` resolves at trace time: TPU backend AND
    ``SSIP_ATTN_PALLAS`` != "0" AND the padded sequence fits VMEM.
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("SSIP_ATTN_PALLAS", "1") != "0"
        )
    if interpret:
        use_pallas = True
    if use_pallas and q.shape[2] <= _MAX_FUSED_SEQ:
        return _attention_fused(q, k, v, interpret)
    return attention_xla(q, k, v)

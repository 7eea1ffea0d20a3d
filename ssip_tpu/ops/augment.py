"""Device-side training augmentations.

The reference's train transform is Resize((S,S)) → RandomHorizontalFlip(0.5)
→ RandomRotation(±10°, nearest, expand=False, fill=0) → ToTensor →
ImageNet-normalize (reference: src/training/common.py:96-119, torchvision
defaults). Here the random ops run *on device* inside the jitted train step:
flips are a masked ``lax.rev`` and rotations are a nearest-neighbor inverse
affine gather — batched, shape-static, PRNG-keyed per epoch.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from ssip_tpu.ops.resize import normalize_imagenet_u8


def random_flip(images: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Per-image horizontal flip with p=0.5. images: [B, H, W, C]."""
    flip = jax.random.bernoulli(key, 0.5, (images.shape[0],))
    flipped = jnp.flip(images, axis=2)
    return jnp.where(flip[:, None, None, None], flipped, images)


def _rotation_index_map(angles: jax.Array, h: int, w: int):
    """Fixed-point inverse pixel map for NN rotation: (iy, ix, valid).

    Inverse mapping: for each output pixel, rotate back to source coords.
    PIL/torchvision rotate: positive angle = counter-clockwise on screen
    (y-down coords) — the inverse pixel map is the clockwise rotation.

    The map is computed in FIXED-POINT integer arithmetic: per-pixel
    float cos·y+sin·x is fma-contraction-sensitive, so the same epoch
    compiled as a fused scan vs per-step programs could round a
    boundary pixel differently and break fused==per-step equivalence
    (tests/test_fused_equivalence.py). Quantizing cos/sin once per image
    to 2⁻¹⁶ and doing the per-pixel work in int32 makes the index map
    bit-identical under any XLA fusion choice (boundary shift vs exact
    trig ≤ ~2⁻¹⁶·max(h,w)/2 px — far below the NN rounding granularity).

    ``iy``/``ix`` are returned UNCLIPPED; ``valid`` marks in-bounds pixels.
    """
    q = 1 << 16
    icos = jnp.round(jnp.cos(angles) * q).astype(jnp.int32)[:, None, None]
    isin = jnp.round(jnp.sin(angles) * q).astype(jnp.int32)[:, None, None]
    yy2 = (2 * jnp.arange(h, dtype=jnp.int32) - (h - 1))[:, None]  # 2(y−cy)
    xx2 = (2 * jnp.arange(w, dtype=jnp.int32) - (w - 1))[None, :]  # 2(x−cx)
    ay = icos * yy2 + isin * xx2  # [B,H,W] = 2q·(src_y − cy)
    ax = -isin * yy2 + icos * xx2
    # iy = floor(src_y + ½) = floor((ay + h·q) / 2q), exactly, in ints
    iy = (ay + h * q) // (2 * q)
    ix = (ax + w * q) // (2 * q)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    return iy, ix, valid


def _rotate_gather(images: jnp.ndarray, iy, ix, valid) -> jnp.ndarray:
    """Index-map application as ONE flat take over the flattened batch.

    Index-identical to the 2-D fancy gather, but measured 4,500 imgs/s on
    v5e vs 2,970 for the per-image (vmapped) take and 2,420 for the 2-D
    gather — one big gather amortizes per-op index-stream setup that B
    separate batched gathers pay repeatedly (int32 RGB-packing and
    take_along_axis variants measured no better). XLA's gather runs on the
    scalar path (~245M indices/s) regardless of formulation — which is why
    the TPU train path uses ``_rotate_mxu`` below instead.
    """
    b, h, w, _ = images.shape
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    flat = (iy * w + ix) + (
        jnp.arange(b, dtype=jnp.int32) * (h * w)
    )[:, None, None]  # [B,H,W] global indices
    gathered = jnp.take(
        images.reshape(b * h * w, -1), flat.reshape(-1), axis=0
    ).reshape(images.shape)
    return jnp.where(valid[..., None], gathered, jnp.zeros_like(gathered))


def _mxu_geometry(h: int, w: int, max_degrees: float):
    """Static band geometry for the MXU rotation path.

    For |θ| ≤ max_degrees, the source rows needed by one [YB, W] output
    row-block span at most ceil(sin·(w−1)) + (YB−1) + fixed-point slack
    rows — a narrow band. Margins are computed from the *fixed-point* index
    map's worst case (±2 rows of floor/quantization slack) so the band is
    guaranteed to cover every in-range index; out-of-range indices land in
    zero padding and are masked by ``valid`` anyway.
    """
    sinm = math.sin(math.radians(max_degrees))
    cosm = math.cos(math.radians(max_degrees))
    yb = 16 if h % 16 == 0 else (8 if h % 8 == 0 else 0)
    if yb == 0:
        return None
    # max |iy| overshoot beyond [0, h) at the image corners
    pt = math.ceil((sinm * (w - 1) + (1.0 - cosm) * (h - 1)) / 2.0) + 2
    # max iy span within one (YB, W) cell
    span = math.ceil(sinm * (w - 1)) + (yb - 1) + 3
    r = ((span + 1 + 7) // 8) * 8
    hp = h + 2 * pt + r  # tall enough that band starts never need clamping
    return yb, pt, r, hp


def _mxu_geometry_blocked(h: int, w: int, max_degrees: float):
    """Geometry for the column-blocked kernel: band both axes.

    The unblocked kernel's one-hot contraction per [YB, W] output block is
    [C·R, W] × [W, YB·W] — at 224² / ±10° that is ~4.3 GFLOP/image, 2.4×
    the ResNet-18 forward itself, because the row band must span the whole
    image width. Blocking the width too shrinks BOTH one-hot factors: an
    output cell [YB, XB] only needs source rows spanning
    sin·(XB−1)+(YB−1) and source columns spanning sin·(YB−1)+(XB−1) — the
    contraction becomes [C·R2, CB] × [CB, YB·XB]. Total MXU tile-units per
    image drop ~4× (cells × n2 is constant h·w, while K: W→CB and
    M: C·R→C·R2 both shrink), and the one-hot build (VPU compares) shrinks
    with them.

    Returns (yb, xb, pt, px, r2, cb, hp, wp) or None when no usable column
    block exists (then the caller falls back to the row-banded kernel).
    """
    sinm = math.sin(math.radians(max_degrees))
    cosm = math.cos(math.radians(max_degrees))
    yb = 16 if h % 16 == 0 else (8 if h % 8 == 0 else 0)
    if yb == 0:
        return None
    # Largest column block that (a) actually blocks (u ≥ 2), (b) keeps the
    # lane dim a multiple of 128, and (c) keeps the contraction dim within
    # one 128-wide MXU pass.
    for xb in range(w - 1, 7, -1):
        if w % xb or (yb * xb) % 128:
            continue
        span_x = math.ceil(sinm * (yb - 1)) + (xb - 1) + 3
        cb = ((span_x + 1 + 7) // 8) * 8
        if cb <= 128:
            break
    else:
        return None
    span_y = math.ceil(sinm * (xb - 1)) + (yb - 1) + 3
    r2 = ((span_y + 1 + 7) // 8) * 8
    pt = math.ceil((sinm * (w - 1) + (1.0 - cosm) * (h - 1)) / 2.0) + 2
    px = math.ceil((sinm * (h - 1) + (1.0 - cosm) * (w - 1)) / 2.0) + 2
    hp = h + 2 * pt + r2  # band starts never need clamping (see unblocked)
    wp = w + 2 * px + cb
    return yb, xb, pt, px, r2, cb, hp, wp


def _rotate_mxu_blocked(
    images_u8: jnp.ndarray, iy, ix, valid, max_degrees: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Column-blocked variant of :func:`_rotate_mxu` (see geometry above).

    Identical algorithm — slice a per-cell source band with one large-slice
    gather, re-express the NN index map as one-hot matmuls — but the band
    is 2-D: each [YB, XB] output cell reads a [R2, CB] source window, so
    the MXU contraction is [C·R2, CB] × [CB, YB·XB] instead of spanning
    the full image width. Bit-identical to the gather path for the same
    reason (one-hot dots of uint8 values are exact in bf16); asserted by
    tests/test_rotate_mxu.py against ``_rotate_gather``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = images_u8.shape
    yb, xb, pt, px, r2, cb, hp, wp = _mxu_geometry_blocked(h, w, max_degrees)
    t = h // yb
    u = w // xb
    n2 = yb * xb

    # Per-cell local indices. Cell mins are over ALL pixels (valid or not):
    # the affine span bound holds for every pixel, so out-of-range indices
    # stay inside the band and land in zero padding (masked by ``valid``).
    iyp = (iy + pt).reshape(b, t, yb, u, xb)
    ixp = (ix + px).reshape(b, t, yb, u, xb)
    cy0 = jnp.min(iyp, axis=(2, 4))  # [B, T, U] band starts
    cx0 = jnp.min(ixp, axis=(2, 4))
    cy0 = jnp.clip(cy0, 0, hp - r2)  # no-op given the margins; pure safety
    cx0 = jnp.clip(cx0, 0, wp - cb)
    e2 = iyp - cy0[:, :, None, :, None]  # [B,T,YB,U,XB] in [0, R2)
    ex = ixp - cx0[:, :, None, :, None]  # in [0, CB)

    padded = jnp.pad(
        images_u8,
        ((0, 0), (pt, hp - h - pt), (px, wp - w - px), (0, 0)),
    )
    src = padded.astype(jnp.bfloat16)
    bidx = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None, None], (b, t, u))
    starts = jnp.stack([bidx, cy0, cx0], axis=-1).reshape(-1, 3)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    bands = jax.lax.gather(
        src, starts, dn, slice_sizes=(1, r2, cb, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(b, t, u, r2, cb, c)
    band_t = bands.transpose(0, 1, 2, 5, 3, 4).reshape(b, t, u, c * r2, cb)
    ex_cells = ex.transpose(0, 1, 3, 2, 4).reshape(b, t, u, 1, n2)
    e2_cells = e2.transpose(0, 1, 3, 2, 4).reshape(b, t, u, 1, n2)

    def kernel(ix_ref, e2_ref, band_ref, out_ref):
        ix_row = ix_ref[0, 0, 0]  # [1, N2] — row vectors: broadcasts ride lanes
        e2_row = e2_ref[0, 0, 0]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (cb, n2), 0)
        c1h_t = (c_iota == ix_row).astype(jnp.bfloat16)  # [CB, N2]
        step1 = jnp.dot(  # [cR2, N2] — the gather, as MXU work
            band_ref[0, 0, 0], c1h_t, preferred_element_type=jnp.float32
        )
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (r2, n2), 0)
        r1h_t = (r_iota == e2_row).astype(jnp.float32)  # [R2, N2]
        for ch in range(c):
            masked = step1[ch * r2:(ch + 1) * r2, :] * r1h_t
            out_ref[0, 0, 0, ch, :] = jnp.sum(masked, axis=0)

    out = pl.pallas_call(
        kernel,
        grid=(b, t, u),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, n2), lambda bi, ti, ui: (bi, ti, ui, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, 1, n2), lambda bi, ti, ui: (bi, ti, ui, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, c * r2, cb), lambda bi, ti, ui: (bi, ti, ui, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 8, n2), lambda bi, ti, ui: (bi, ti, ui, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, u, 8, n2), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(ex_cells, e2_cells, band_t)
    g = (
        out[:, :, :, :c, :]
        .reshape(b, t, u, c, yb, xb)
        .transpose(0, 1, 4, 2, 5, 3)
        .reshape(b, h, w, c)
    )
    g = g.astype(jnp.uint8)
    return jnp.where(valid[..., None], g, jnp.zeros_like(g))


def _rotate_mxu(
    images_u8: jnp.ndarray, iy, ix, valid, max_degrees: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """NN rotation on the MXU: one-hot matmuls instead of a hardware gather.

    XLA lowers the rotation gather to the scalar unit (~245M indices/s —
    50% of the fused train step's device time at batch 64). This kernel
    re-expresses the same index map as dense compute:

      1. XLA prep: slice a [R, W] source row-band per (image, 16-row output
         block) with ONE large-slice gather (large contiguous slices run on
         the DMA path at ~80+ GB/s, unlike per-element gathers).
      2. Pallas kernel per (image, block): build the column one-hot
         C1ᵀ[c, i] = (c == ix[i]) with a lane-direction broadcast (the
         cheap VPU direction — the untransposed [i, c] layout costs 5× by
         broadcasting per-sublane scalars across lanes), contract it with
         the band on the MXU, then reduce the R rows of the [3R, N]
         product with a row one-hot mask — channel blocks are sublane
         slices, so the reduction never touches the lane axis.

    One-hot dots of uint8 values are EXACT in bf16 (integers ≤ 255 carry 8
    mantissa bits; exactly one nonzero per contraction), so the result is
    bit-identical to ``_rotate_gather`` — asserted by
    tests/test_rotate_mxu.py, and measured 21,200 imgs/s vs 4,500 on v5e
    (augmentation alone, batch 64).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = images_u8.shape
    yb, pt, r, hp = _mxu_geometry(h, w, max_degrees)
    t = h // yb
    n = yb * w

    iyp = iy + pt
    cy0 = jnp.min(iyp.reshape(b, t, yb, w), axis=(2, 3))  # [B,T] band starts
    cy0 = jnp.clip(cy0, 0, hp - r)  # no-op given the margins; pure safety
    e2 = iyp.reshape(b, t, yb, w) - cy0[:, :, None, None]

    padded = jnp.pad(images_u8, ((0, 0), (pt, hp - h - pt), (0, 0), (0, 0)))
    src = padded.astype(jnp.bfloat16)
    starts = jnp.stack(
        [jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, t)), cy0],
        axis=-1,
    ).reshape(-1, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,), start_index_map=(0, 1)
    )
    bands = jax.lax.gather(
        src, starts, dn, slice_sizes=(1, r, w, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(b, t, r, w, c)
    band_t = bands.transpose(0, 1, 4, 2, 3).reshape(b, t, c * r, w)

    def kernel(ix_ref, e2_ref, band_ref, out_ref):
        ix_row = ix_ref[0, 0]  # [1, N] — row vectors: broadcasts ride lanes
        e2_row = e2_ref[0, 0]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (w, n), 0)
        c1h_t = (c_iota == ix_row).astype(jnp.bfloat16)  # [W, N]
        step1 = jnp.dot(  # [cR, N] — the gather, as MXU work
            band_ref[0, 0], c1h_t, preferred_element_type=jnp.float32
        )
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (r, n), 0)
        r1h_t = (r_iota == e2_row).astype(jnp.float32)  # [R, N]
        for ch in range(c):
            masked = step1[ch * r:(ch + 1) * r, :] * r1h_t
            out_ref[0, 0, ch, :] = jnp.sum(masked, axis=0)

    out = pl.pallas_call(
        kernel,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, 1, n), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, n), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c * r, w), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, n), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, 8, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(ix.reshape(b, t, 1, n), e2.reshape(b, t, 1, n), band_t)
    g = out[:, :, :c, :].transpose(0, 1, 3, 2).reshape(b, h, w, c)
    g = g.astype(jnp.uint8)
    return jnp.where(valid[..., None], g, jnp.zeros_like(g))


def _use_mxu_rotation(images: jnp.ndarray, max_degrees: float) -> bool:
    """MXU path gate: TPU backend, uint8 pixels, supported geometry.

    Per-project invariant, Pallas is TPU-only — CPU/GPU take the XLA
    gather, and tests compare the two in interpret mode. uint8-only
    because band values must be bf16-exact. The band-FLOP cost grows with
    sin(max_degrees); past ~25° the matmul work approaches the gather's
    cost, so wide rotations keep the gather.
    """
    if images.dtype != jnp.uint8:
        return False
    b, h, w, c = images.shape
    if c != 3 or max_degrees > 25.0:
        return False
    if _mxu_geometry(h, w, max_degrees) is None:
        return False
    if h * w < 64 * 64:  # band machinery not worth it for tiny images
        return False
    return jax.default_backend() == "tpu"


def random_rotate_nearest(
    images: jnp.ndarray, key: jax.Array, max_degrees: float = 10.0
) -> jnp.ndarray:
    """Per-image rotation by U(-max_deg, max_deg) about the center.

    Nearest-neighbor sampling, no expansion, zero fill — torchvision
    RandomRotation defaults. images: [B, H, W, C] (any numeric dtype).
    On TPU with uint8 inputs the index map is applied on the MXU
    (``_rotate_mxu``); elsewhere via the flat-take gather. Both paths are
    bit-identical (tests/test_rotate_mxu.py).
    """
    b, h, w, _ = images.shape
    angles = jax.random.uniform(
        key, (b,), minval=-max_degrees, maxval=max_degrees
    ) * (jnp.pi / 180.0)
    iy, ix, valid = _rotation_index_map(angles, h, w)
    if _use_mxu_rotation(images, max_degrees):
        # Default is the row-banded kernel: the column-blocked variant wins
        # the standalone microbench but LOSES the fused train step badly
        # (bf16 batch-128 v5e ablation 2026-08-19: blocked 16.5 steps/s vs
        # row-banded 28.6 — the extra band gathers starve the conv pipeline).
        # SSIP_ROTATE_BLOCKED=1 opts back in.
        blocked_ok = os.environ.get("SSIP_ROTATE_BLOCKED", "0") == "1"
        if blocked_ok and _mxu_geometry_blocked(h, w, max_degrees) is not None:
            return _rotate_mxu_blocked(images, iy, ix, valid, max_degrees)
        return _rotate_mxu(images, iy, ix, valid, max_degrees)
    return _rotate_gather(images, iy, ix, valid)


def train_augment(
    images_u8: jnp.ndarray, key: jax.Array, rotate_degrees: float = 10.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """flip → rotate → ToTensor → normalize; input uint8-valued [B,S,S,3]."""
    k_flip, k_rot = jax.random.split(key)
    x = random_flip(images_u8, k_flip)
    x = random_rotate_nearest(x, k_rot, rotate_degrees)
    return normalize_imagenet_u8(x, dtype=dtype)


def eval_preprocess(images_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Eval chain: ToTensor → normalize (resize happens upstream)."""
    return normalize_imagenet_u8(images_u8, dtype=dtype)


def weak_augment(images_u8: jnp.ndarray, key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
    """FixMatch 'weak' view: horizontal flip only → normalize."""
    x = random_flip(images_u8, key)
    return normalize_imagenet_u8(x, dtype=dtype)


def strong_augment(
    images_u8: jnp.ndarray, key: jax.Array, rotate_degrees: float = 10.0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """FixMatch 'strong' view: flip → rotate → brightness/contrast jitter."""
    k_flip, k_rot, k_bright, k_contrast = jax.random.split(key, 4)
    x = random_flip(images_u8, k_flip)
    x = random_rotate_nearest(x, k_rot, rotate_degrees).astype(jnp.float32)
    b = images_u8.shape[0]
    brightness = jax.random.uniform(k_bright, (b, 1, 1, 1), minval=-32.0, maxval=32.0)
    contrast = jax.random.uniform(k_contrast, (b, 1, 1, 1), minval=0.7, maxval=1.3)
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    x = jnp.clip((x - mean) * contrast + mean + brightness, 0.0, 255.0)
    return normalize_imagenet_u8(x, dtype=dtype)

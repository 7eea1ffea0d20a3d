"""Sequence/context parallelism (ring attention) for the ViT encoder.

The reference has no attention and no sequence axis (its model is a CNN —
reference src/training/common.py:299-304), so SURVEY §2.2 scoped SP/CP out.
The ViT family (models/vit.py) introduces both, and this module adds the
TPU-native capability: shard the *token* axis of the encoder over the mesh
``model`` axis, so activation memory per device scales as O(S/P) — the axis
that matters when the sequence, not the parameter count, outgrows one chip
(bigger inputs / smaller patches: 512²/8 is 4097 tokens, 896²/8 is 12545).

Design — the scaling-book recipe, not a torch-style P2P scheduler:

* **Everything except attention is already token-parallel.** LayerNorm
  normalizes over the hidden axis (per token), and the QKV/out/MLP matmuls
  are per-token GEMMs — with parameters replicated, each device runs the
  stock block math on its token shard with zero communication.
* **Attention is a ring.** Each device holds its Q/K/V token block; K/V
  blocks rotate around the ``model`` axis with ``lax.ppermute`` while a
  running (max, sum, accumulator) online-softmax merges one block of
  scores per tick — full attention in P ticks with only O(S/P) live keys
  per device and no materialized [S, S] matrix (flash-attention algebra,
  ring-attention schedule).
* **The backward pass is free.** The schedule is a ``lax.scan`` of pure
  ops; ``jax.grad`` differentiates through it, and the transpose of
  ``ppermute`` is the reverse rotation — XLA emits the collectives.

Token padding follows ops/attention.py's convention: the sequence pads to
a multiple of the axis size, padded KEYS are masked out of every softmax,
and padded query rows compute bounded garbage that the caller slices off.

Parameters stay in the *plain* ViT layout (replicated over the mesh), so
checkpointing, torch export, and the training engine's freezing rules all
apply unchanged; ``make_sp_apply_fn`` satisfies the engine model contract
and composes with data parallelism (batch over ``data`` × tokens over
``model`` — a 2-D activation sharding).

At this project's flagship shape (224²/16 → 197 tokens) SP is inert — the
training CLIs default to DP×TP×FSDP — but the capability is tested to the
same bar as DP/TP/FSDP/PP: forward, gradients, and a full engine step match
the single-program model to fp tolerance (tests/test_sequence_parallel.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ssip_tpu.models.vit import LN_EPS, VisionTransformer
from ssip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from ssip_tpu.parallel.pipeline import _final_head, _patch_embed

_NEG_INF = np.float32(-1e30)  # finite, matching ops/attention.py's masking


def make_ring_attention(num_shards: int, seq_len: int, axis_name: str):
    """Build ``ring_attn(q, k, v) -> o`` for use INSIDE ``shard_map``.

    q/k/v: this device's token block, ``[B, H, T, Dh]`` with
    ``T = ceil(seq_len / num_shards)``; blocks beyond ``seq_len`` are
    padding. K/V rotate ``num_shards`` times around ``axis_name`` while an
    online softmax merges each visiting block:

        m' = max(m, max_k s)            (running row max)
        c  = exp(m - m')                (rescale old sums)
        l' = l·c + Σ_k exp(s - m')      (running denominator)
        a' = a·c + exp(s - m')·V        (running numerator)

    which telescopes to exactly softmax(QKᵀ)·V over all visited blocks —
    the flash-attention identity, associativity being the only fp
    difference from the one-shot softmax (tolerance-tested).
    """
    perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]

    def ring_attn(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        b, h, t, dh = q.shape
        scale = np.float32(1.0 / np.sqrt(dh))
        idx = jax.lax.axis_index(axis_name)
        q32 = q.astype(jnp.float32)

        def tick(carry, step):
            kb, vb, m, l, acc = carry
            # after `step` rotations we hold the block that started on
            # device (idx - step): its keys' global positions locate the
            # padding mask
            src = jax.lax.rem(idx - step + num_shards, num_shards)
            key_pos = src * t + jax.lax.iota(jnp.int32, t)
            valid = key_pos < seq_len  # [T]
            s = (
                jnp.einsum(
                    "bhqd,bhkd->bhqk",
                    q32,
                    kb.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            s = jnp.where(valid[None, None, None, :], s, _NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            corr = jnp.exp(m - m_new)
            e = jnp.exp(s - m_new[..., None])
            # belt-and-braces: a fully-masked block yields exp(0)=1 rows
            # when m is still at the -1e30 floor — zero them explicitly
            e = jnp.where(valid[None, None, None, :], e, 0.0)
            l_new = l * corr + jnp.sum(e, axis=-1)
            pv = jnp.einsum(
                "bhqk,bhkd->bhqd",
                e.astype(q.dtype),
                vb,
                preferred_element_type=jnp.float32,
            )
            acc_new = acc * corr[..., None] + pv
            if num_shards > 1:
                kb, vb = jax.lax.ppermute((kb, vb), axis_name, perm)
            return (kb, vb, m_new, l_new, acc_new), None

        # the accumulators become device-varying once they mix with the
        # local q — derive the inits FROM q so they carry exactly q's
        # varying axes, whatever mesh axes the enclosing shard_map spans
        # (a pcast over just `axis_name` breaks when the caller also
        # shards the batch; zeros from q arithmetic always type-match)
        zero_row = jnp.sum(q32, axis=-1) * 0.0  # [B, H, T], varying like q
        init = (
            k,
            v,
            zero_row + _NEG_INF,
            zero_row,
            q32 * 0.0,
        )
        (_, _, _, l, acc), _ = jax.lax.scan(
            tick, init, jnp.arange(num_shards, dtype=jnp.int32)
        )
        # padded query rows have l == 0 — clamp instead of NaN-ing so
        # downstream per-token math stays finite (rows are sliced off)
        out = acc / jnp.maximum(l, 1e-30)[..., None]
        return out.astype(q.dtype)

    return ring_attn


def _layer_norm(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    """f32 LayerNorm matching flax nn.LayerNorm(eps=LN_EPS) numerics."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * p["scale"] + p["bias"]


def _dense(p: dict, x: jnp.ndarray, ct: Any) -> jnp.ndarray:
    return x.astype(ct) @ p["kernel"].astype(ct) + p["bias"].astype(ct)


def _block_apply(
    bp: dict, x: jnp.ndarray, num_heads: int, ct: Any, ring_attn
) -> jnp.ndarray:
    """models/vit.py EncoderBlock with the attention core swapped for the
    ring — identical dtype discipline (LN f32, matmuls in compute dtype,
    residual in the carry dtype)."""
    b, t, d = x.shape
    dh = d // num_heads
    y = _layer_norm(bp["ln_1"], x).astype(ct)
    qkv = _dense(bp["qkv"], y, ct).reshape(b, t, 3, num_heads, dh)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    o = ring_attn(q, k, v)
    o = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, t, d)
    x = x + _dense(bp["out"], o, ct).astype(x.dtype)

    y = _layer_norm(bp["ln_2"], x).astype(ct)
    y = jax.nn.gelu(_dense(bp["mlp_1"], y, ct), approximate=False)
    return x + _dense(bp["mlp_2"], y, ct).astype(x.dtype)


def make_sp_vit_forward(model: VisionTransformer, mesh: Mesh):
    """Build ``forward(params, x) -> features|logits`` with the token axis
    sharded over the mesh ``model`` axis and batch over ``data``.

    ``params`` is the PLAIN ViT tree (as from ``model.init``), replicated.
    Patch embedding and the final-LN/head (a few % of FLOPs) run outside
    the token shard, data-parallel; the encoder — ~99% of ViT FLOPs — runs
    token-sharded with ring attention.
    """
    num_shards = int(mesh.shape[MODEL_AXIS])
    ct = model.compute_dtype

    def encoder(stacked: Any, tok: jnp.ndarray, seq_len: int) -> jnp.ndarray:
        ring_attn = make_ring_attention(num_shards, seq_len, MODEL_AXIS)

        def body(carry, bp):
            return _block_apply(bp, carry, model.num_heads, ct, ring_attn), None

        out, _ = jax.lax.scan(body, tok, stacked)
        return out

    def forward(params: dict, x: jnp.ndarray, return_features: bool = False):
        tok = _patch_embed(params, x, model)
        b, s, d = tok.shape
        t_pad = -(-s // num_shards) * num_shards
        tok = jnp.pad(tok, ((0, 0), (0, t_pad - s), (0, 0)))
        # stack the blocks leaf-wise [L, ...] so the encoder is one scan
        blocks = [params[f"block{i}"] for i in range(model.num_layers)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        sharded = jax.shard_map(
            lambda st, tk: encoder(st, tk, s),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, MODEL_AXIS, None)),
            out_specs=P(DATA_AXIS, MODEL_AXIS, None),
        )
        out = sharded(stacked, tok)[:, :s]
        return _final_head(params, out, return_features)

    return forward


def make_sp_apply_fn(model: VisionTransformer, mesh: Mesh):
    """Training-engine-compatible ``apply_fn`` over the plain ViT params —
    drives the stock ``make_train_step`` / ``eval_step`` unchanged, and
    checkpoints/export need no layout conversion (unlike PP's split tree)."""
    forward = make_sp_vit_forward(model, mesh)

    def apply_fn(
        variables, x, train=False, mask=None, mutable=None, return_features=False
    ):
        del train, mask  # stat-free + per-sample norms, as in models/vit.py
        out = forward(variables["params"], x, return_features)
        if mutable:
            return out, {}
        return out

    return apply_fn

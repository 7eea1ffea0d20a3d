"""Mixture-of-Experts ViT (top-k routing, dense TPU dispatch).

A TPU-extra capacity family beyond the reference's single dense backbone
(the reference's entire model surface is ``torchvision.models.resnet18`` —
reference src/training/common.py:299-304); no reference counterpart exists,
so the design follows the public Switch-Transformer / V-MoE recipe rather
than any torch code:

* **Top-k routing**: a small f32 router projects each token to
  ``num_experts`` logits; the top-k experts process the token, gated by
  softmax probability (``router_top_k=1`` — Switch, raw-prob gate, the
  default; ``router_top_k=2`` — GShard/V-MoE, gates renormalized over the
  pair). Gradients reach the router through the gates.
* **Dense one-hot dispatch** — the TPU-native choice. Instead of gather/
  scatter (dynamic shapes XLA cannot tile), tokens move to expert slots via
  two einsums against a ``[B, S, E, C]`` one-hot dispatch tensor with a
  *static* per-expert capacity ``C = ceil(S · capacity_factor / E)``.
  Everything stays a fixed-shape GEMM on the MXU; tokens past an expert's
  capacity are dropped for this layer (the residual stream carries them —
  standard Switch behavior).
* **Load-balance auxiliary loss** (Switch eq. 4):
  ``E · Σ_e f_e · P_e`` with ``f_e`` the fraction of tokens routed to
  expert ``e`` and ``P_e`` the mean router probability; ``1.0`` at perfect
  balance. Sown into the ``"aux"`` collection scaled by ``aux_loss_coef``;
  the training engine adds every ``"aux"`` leaf to the objective
  (train/engine.py), and eval forwards (no mutable) drop it.
* **Expert parallelism**: every expert parameter carries a leading ``[E]``
  axis that ``parallel.mesh.tp_param_spec`` shards over the mesh ``model``
  axis, so each device holds ``E / model_par`` experts and XLA turns the
  dispatch/return einsums into the all-to-all exchange — annotation only,
  no hand-written collectives (the scaling-book recipe). Composes with the
  Megatron attention-TP rules on the same axis and with FSDP/DP.

Architecture: the plain ``models.vit`` tower with every second encoder
block's MLP swapped for the expert layer (the Switch/V-MoE "every-other"
placement); attention, LayerNorms, names (``block{i}``, ``qkv``, ``out``,
``fc``) and dtype discipline (params/LN f32, matmuls in ``compute_dtype``)
are identical, so the engine's freezing rules and the attention TP rules
apply unchanged. No torchvision topology exists for MoE, so torch porting
is N/A for these archs.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssip_tpu.models.vit import EncoderBlock, FusedLayerNorm
from ssip_tpu.ops.attention import fused_attention_qkv

# Per-expert lecun_normal: fan from the (in, out) trailing axes; the leading
# expert axis is a batch axis, NOT receptive field (default fan computation
# would fold E into fan_in and under-scale every expert by sqrt(E)).
_expert_init = nn.initializers.variance_scaling(
    1.0, "fan_in", "truncated_normal", in_axis=-2, out_axis=-1, batch_axis=(0,)
)


class MoEMlp(nn.Module):
    """Routed expert MLP over tokens ``[B, S, D] -> [B, S, D]``.

    Two routing families, both dense/static-shape:

    * ``routing="token_choice"`` (default) — tokens pick experts.
      ``router_top_k=1`` is the Switch recipe (argmax expert,
      raw-probability gate); ``router_top_k=2`` is the GShard/V-MoE recipe
      (two experts per token, gates renormalized over the chosen pair).
      The k>1 case reuses the top-1 dispatch machinery on a K-repeated
      token axis: assignment rank r of token s becomes pseudo-token
      ``s*K + r``, so capacity, slotting, and the dispatch/return einsums
      are rank-agnostic. Needs the load-balance aux loss; assignments
      beyond an expert's capacity are dropped.
    * ``routing="expert_choice"`` (Zhou et al. 2022) — experts pick their
      top-C tokens by router affinity. Every expert is exactly full by
      construction, so there is no balance loss to tune and no overflow
      drop asymmetry — the most TPU-idiomatic variant (one ``top_k`` per
      expert, everything else identical static-shape GEMMs). Tokens may be
      chosen by zero experts (residual carries them) or several (their
      outputs sum, weighted by affinity).

    Input is the post-LayerNorm hidden (compute dtype); output is the
    residual branch.
    """

    num_experts: int
    mlp_dim: int
    capacity_factor: float = 1.25
    aux_loss_coef: float = 0.01
    router_top_k: int = 1
    routing: str = "token_choice"
    router_z_loss_coef: float = 0.0  # ST-MoE logit regularizer; 1e-3 typical
    compute_dtype: Any = jnp.float32

    def _expert_ffn(self, xe: jnp.ndarray, d: int, ct: Any) -> jnp.ndarray:
        """Batched per-expert MLP on dispatched slots ``[E, B, C, D]``."""
        e = self.num_experts
        w_in = self.param("w_in", _expert_init, (e, d, self.mlp_dim), jnp.float32)
        b_in = self.param(
            "b_in", nn.initializers.zeros, (e, self.mlp_dim), jnp.float32
        )
        h = jnp.einsum("ebcd,edf->ebcf", xe, w_in.astype(ct))
        h = nn.gelu(h + b_in[:, None, None, :].astype(ct), approximate=False)
        w_out = self.param(
            "w_out", _expert_init, (e, self.mlp_dim, d), jnp.float32
        )
        b_out = self.param("b_out", nn.initializers.zeros, (e, d), jnp.float32)
        out_e = jnp.einsum("ebcf,efd->ebcd", h, w_out.astype(ct))
        return out_e + b_out[:, None, None, :].astype(ct)

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        b, s, d = y.shape
        e = self.num_experts
        k = self.router_top_k
        if not 1 <= k <= e:
            raise ValueError(f"router_top_k={k} must be in [1, {e}]")
        if self.routing not in ("token_choice", "expert_choice"):
            raise ValueError(f"unknown MoE routing {self.routing!r}")
        # per-expert queue capacity over all S*K assignments (GShard
        # convention: k assignments per token share the same buffer pool)
        cap = max(1, math.ceil(s * k * self.capacity_factor / e))
        ct = self.compute_dtype

        # Router math in f32: softmax over expert logits must not see bf16
        # rounding or ties resolve differently across shardings.
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            y.astype(jnp.float32)
        )  # [B, S, E]
        probs = nn.softmax(logits, axis=-1)

        # Router z-loss (ST-MoE): penalize large logit magnitudes so the
        # router's softmax stays away from saturated/round-off regimes.
        # Off by default; applies to either routing family.
        if self.router_z_loss_coef > 0.0:
            z = jax.nn.logsumexp(logits, axis=-1)
            self.sow(
                "aux",
                "router_z",
                jnp.float32(self.router_z_loss_coef) * jnp.mean(jnp.square(z)),
            )

        if self.routing == "expert_choice":
            # Each expert takes its top-C tokens (C = ceil(S·cf/E), K
            # unused): one top_k over the token axis per expert, then the
            # same dispatch/return einsums as token choice. Perfectly
            # balanced by construction — nothing to sow.
            cap_ec = min(s, max(1, math.ceil(s * self.capacity_factor / e)))
            gates_ec, tok_idx = jax.lax.top_k(
                jnp.swapaxes(probs, 1, 2), cap_ec
            )  # both [B, E, C]
            dispatch = nn.one_hot(tok_idx, s, dtype=jnp.float32)  # [B,E,C,S]
            combine = dispatch * gates_ec[..., None]
            xe = jnp.einsum(
                "becs,bsd->ebcd", dispatch.astype(ct), y.astype(ct)
            )
            out_e = self._expert_ffn(xe, d, ct)
            return jnp.einsum("ebcd,becs->bsd", out_e, combine.astype(ct))
        top_probs, top_idx = jax.lax.top_k(probs, k)  # [B, S, K]
        if k == 1:
            gate = top_probs  # Switch: raw probability of the argmax expert
        else:
            # GShard/V-MoE: gates renormalized over the chosen pair so the
            # expert mixture is a convex combination
            gate = top_probs / jnp.sum(top_probs, axis=-1, keepdims=True)
        onehot = nn.one_hot(top_idx, e, dtype=jnp.float32)  # [B, S, K, E]

        # Load-balance loss BEFORE capacity drops (the routing decision is
        # what balance pressure must shape, not the overflow artifact).
        # f_e = fraction of assignments landing on expert e (all K ranks).
        frac = jnp.mean(jnp.sum(onehot, axis=2), axis=(0, 1))  # f_e, sums to k
        mean_prob = jnp.mean(probs, axis=(0, 1))  # P_e
        self.sow(
            "aux",
            "load_balance",
            jnp.float32(self.aux_loss_coef)
            * (e / k)
            * jnp.sum(frac * mean_prob),
        )

        # Flatten ranks into the token axis: pseudo-token t = s*K + r.
        sk = s * k
        onehot = onehot.reshape(b, sk, e)
        gate = gate.reshape(b, sk)

        # Slot assignment: position of each assignment within its expert's
        # queue (cumsum over pseudo-tokens — deterministic earliest-first,
        # rank-1 before rank-2 for the same token).
        pos = jnp.cumsum(onehot, axis=1) * onehot  # [B, S*K, E], 1-indexed
        kept = onehot * (pos <= cap)
        slot_oh = nn.one_hot(
            (pos - 1.0).clip(0).astype(jnp.int32), cap, dtype=jnp.float32
        )  # [B, S*K, E, C]
        dispatch = kept[..., None] * slot_oh  # [B, S*K, E, C] in {0, 1}
        combine = dispatch * gate[..., None, None]

        # expert inputs: [E, B, C, D] — one static-shape GEMM per einsum;
        # under expert parallelism the E axis is mesh-sharded and XLA makes
        # this the token all-to-all. Each pseudo-token reads its source
        # token's hidden (repeat along the token axis; k=1 is a no-op).
        y_rep = jnp.repeat(y, k, axis=1) if k > 1 else y  # [B, S*K, D]
        xe = jnp.einsum("btec,btd->ebcd", dispatch.astype(ct), y_rep.astype(ct))
        out_e = self._expert_ffn(xe, d, ct)
        # return trip: outputs weighted by the gate; dropped assignments get
        # exact zeros (their combine row is all-zero); ranks of the same
        # token sum back into it
        out = jnp.einsum("ebcd,btec->btd", out_e, combine.astype(ct))
        return out.reshape(b, s, k, d).sum(axis=2) if k > 1 else out


class MoEEncoderBlock(nn.Module):
    """EncoderBlock with the dense MLP swapped for ``MoEMlp``.

    The attention sublayer repeats models/vit.py:EncoderBlock line-for-line
    (same ``qkv``/``out`` names and dtype discipline) so attention tensor
    parallelism, head-freezing, and checkpoints treat both block kinds
    identically; only the MLP branch differs.
    """

    num_heads: int
    mlp_dim: int
    num_experts: int
    capacity_factor: float = 1.25
    aux_loss_coef: float = 0.01
    router_top_k: int = 1
    routing: str = "token_choice"
    router_z_loss_coef: float = 0.0
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, d = x.shape
        if d % self.num_heads != 0:
            raise ValueError(f"hidden dim {d} not divisible by {self.num_heads} heads")

        y = FusedLayerNorm(out_dtype=self.compute_dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.compute_dtype, name="qkv")(y)
        o = fused_attention_qkv(qkv, self.num_heads)
        o = nn.Dense(d, dtype=self.compute_dtype, name="out")(o)
        x = x + o.astype(x.dtype)

        y = FusedLayerNorm(out_dtype=self.compute_dtype, name="ln_2")(x)
        y = MoEMlp(
            num_experts=self.num_experts,
            mlp_dim=self.mlp_dim,
            capacity_factor=self.capacity_factor,
            aux_loss_coef=self.aux_loss_coef,
            router_top_k=self.router_top_k,
            routing=self.routing,
            router_z_loss_coef=self.router_z_loss_coef,
            compute_dtype=self.compute_dtype,
            name="moe",
        )(y)
        return x + y.astype(x.dtype)


class MoEVisionTransformer(nn.Module):
    """ViT tower with every ``moe_every``-th block an expert block.

    Same call contract as ``models.VisionTransformer`` (and the engine's
    model interface): ``num_classes=None`` → feature extractor; ``mask``
    accepted and ignored (per-sample LayerNorm). ``remat`` checkpoints each
    block on the backward pass, as in the dense ViT.
    """

    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_experts: int = 8
    capacity_factor: float = 1.25
    aux_loss_coef: float = 0.01
    router_top_k: int = 1  # 1 = Switch; 2 = GShard/V-MoE pair routing
    routing: str = "token_choice"  # or "expert_choice" (Zhou et al. 2022)
    router_z_loss_coef: float = 0.0  # ST-MoE logit regularizer; 1e-3 typical
    moe_every: int = 2  # blocks i with i % moe_every == moe_every-1 are MoE
    num_classes: Optional[int] = None
    compute_dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        *,
        train: bool = False,
        return_features: bool = False,
        mask: Optional[jnp.ndarray] = None,
    ):
        del train, mask  # stat-free, no dropout — see models/vit.py
        b, h, w, c = x.shape
        p = self.patch_size
        if h % p or w % p:
            raise ValueError(f"image size {h}x{w} not divisible by patch size {p}")
        x = nn.Conv(
            self.hidden_dim, (p, p), strides=(p, p), use_bias=True,
            dtype=self.compute_dtype, name="conv_proj",
        )(x.astype(self.compute_dtype))
        x = x.reshape(b, -1, self.hidden_dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.hidden_dim), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.hidden_dim)).astype(x.dtype), x],
            axis=1,
        )
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(stddev=0.02),
            (1, x.shape[1], self.hidden_dim),
            jnp.float32,
        )
        x = x + pos.astype(x.dtype)

        dense_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        moe_cls = nn.remat(MoEEncoderBlock) if self.remat else MoEEncoderBlock
        for i in range(self.num_layers):
            if i % self.moe_every == self.moe_every - 1:
                x = moe_cls(
                    num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                    num_experts=self.num_experts,
                    capacity_factor=self.capacity_factor,
                    aux_loss_coef=self.aux_loss_coef,
                    router_top_k=self.router_top_k,
                    routing=self.routing,
                    router_z_loss_coef=self.router_z_loss_coef,
                    compute_dtype=self.compute_dtype, name=f"block{i}",
                )(x)
            else:
                x = dense_cls(
                    num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                    compute_dtype=self.compute_dtype, name=f"block{i}",
                )(x)

        # per-row LN: normalizing only the class token equals
        # normalize-then-slice (models/vit.py does the same)
        features = FusedLayerNorm(out_dtype=jnp.float32, name="ln")(
            x[:, 0].astype(jnp.float32)
        )
        if self.num_classes is None:
            return features
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(features)
        if return_features:
            return logits, features
        return logits


# Expert counts follow V-MoE's small-scale recipe (8 experts, every other
# block); tower shapes mirror the dense s16/t16 configs so dense-vs-MoE
# comparisons isolate the expert layer.
MOE_CONFIGS = {
    "vit_moe_s16": dict(
        patch_size=16, hidden_dim=384, num_layers=12, num_heads=6,
        mlp_dim=1536, num_experts=8,
    ),
    "vit_moe_t16": dict(
        patch_size=16, hidden_dim=192, num_layers=12, num_heads=3,
        mlp_dim=768, num_experts=8,
    ),
}


def _factory(name: str):
    cfg = MOE_CONFIGS[name]

    def make(
        num_classes: Optional[int] = None,
        compute_dtype: Any = jnp.float32,
        remat: bool = False,
        num_experts: Optional[int] = None,
    ):
        # ``num_experts`` override: the expert-count scaling axis
        # (benchmarks/moe_scaling.py measures 8/16/32-expert variants —
        # top-1 routing keeps per-token FLOPs constant while parameters
        # scale linearly, the regime where the MoE pays)
        kw = dict(cfg)
        if num_experts is not None:
            kw["num_experts"] = num_experts
        return MoEVisionTransformer(
            num_classes=num_classes, compute_dtype=compute_dtype,
            remat=remat, **kw,
        )

    make.__name__ = name
    return make


MOE_FACTORIES = {name: _factory(name) for name in MOE_CONFIGS}

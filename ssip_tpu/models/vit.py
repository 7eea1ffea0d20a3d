"""TPU-native Vision Transformer family (torchvision-compatible topology).

A TPU-extra backbone family beyond the reference's ResNet-18 (the reference's
entire model surface is ``torchvision.models.resnet18`` — reference
src/feature_extraction.py:210-227 and src/training/common.py:299-304). The
ViT maps even better onto the MXU than the CNN: the whole network is dense
matmuls (patch embedding lowers to one [B·tokens, p²·3]×[p²·3, D] GEMM;
attention and MLP are GEMMs), there is no BatchNorm (LayerNorm statistics
are per-sample, so padded batch rows need no masking and data-parallel
training is trivially device-count invariant), and the attention core runs
as a fused Pallas kernel on TPU (``ssip_tpu.ops.attention``).

Topology matches ``torchvision.models.vision_transformer.VisionTransformer``
exactly so torch checkpoints port mechanically (models/port_torch.py):

    conv_proj (patch conv, bias)  →  prepend class token  →  + pos_embedding
    → N × [ln_1 → MHA → +res → ln_2 → Linear/GELU(exact)/Linear → +res]
    → final ln → features = token 0 → fc head

Naming notes: the classifier head is ``fc`` (not torchvision's
``heads.head``) so the training engine's head-only freezing and the fc
tensor-parallel rule apply unchanged; the q/k/v projections are one fused
``qkv`` Dense (one wide MXU GEMM; torch's in_proj_weight transposes straight
into it).

Mixed precision follows the repo convention: params, LayerNorm math, and the
final features stay f32; matmul activations run in ``compute_dtype``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from ssip_tpu.ops.attention import fused_attention_qkv
from ssip_tpu.ops.layernorm import layer_norm

LN_EPS = 1e-6  # torchvision ViT's norm_layer = partial(LayerNorm, eps=1e-6)


class FusedLayerNorm(nn.Module):
    """LayerNorm keeping the residual stream resident in its own dtype.

    The flax ``nn.LayerNorm(dtype=f32)`` + astype sandwich materialized a
    full f32 copy of the [B, S, D] stream per LN on TPU (~30% of ViT-B/16
    embed device time, outputs/notes/profile_embed_vit_b16.md); the fused
    op (ops/layernorm.py) computes f32 moments in-register and reads/writes
    bf16 once. Parameter names/shapes match ``nn.LayerNorm`` (scale, bias —
    f32), so checkpoints and torch porting are unaffected.
    """

    epsilon: float = LN_EPS
    out_dtype: Any = None  # None: keep the input dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        y = layer_norm(x, scale, bias, eps=self.epsilon)
        return y if self.out_dtype is None else y.astype(self.out_dtype)


def round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# Pad the token axis to this multiple in the flat-stream layout: 16 is the
# bf16 sublane tile (8 sublanes × 2-packed), so [B, S_pad, D] and
# [B·S_pad, D] share one physical layout and every reshape between them is
# a free bitcast. (f32 needs 8, int8 row-blocks are image-agnostic — 16
# covers every dtype the stream uses.)
_SEQ_PAD_MULTIPLE = 16


class EncoderBlock(nn.Module):
    """Pre-norm transformer encoder block (torchvision EncoderBlock).

    Two input layouts, one parameter structure:

    - [B, S, D]: the classic form (used by the MoE interleave and the
      pipeline-parallel stages).
    - [B·S_pad, D] flat, with ``seq``/``seq_pad`` set: the whole sublayer
      chain runs rank-2, so every GEMM/LN/residual output is an
      unambiguous row-major [M, D] and XLA's layout assignment has no
      {2,0,1}-vs-{2,1,0} choice to make. The round-4 trace showed those
      3-D relayout copies + the LN wrapper's unfree [B,197,D]↔[25216,D]
      reshapes costing 13.6% of ViT-B/16 embed device time
      (outputs/notes/profile_embed_vit_b16.md, "data formatting"). Only
      the attention kernel sees a (free) 3-D view; its ``kv_len`` mask
      zeroes the pad keys so real rows match the unpadded math to
      fp-reduction-order tolerance.
    """

    num_heads: int
    mlp_dim: int
    compute_dtype: Any = jnp.float32
    seq: int = 0  # logical tokens per image (flat layout only)
    seq_pad: int = 0  # padded tokens per image (flat layout only)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        if d % self.num_heads != 0:
            raise ValueError(f"hidden dim {d} not divisible by {self.num_heads} heads")
        flat = x.ndim == 2
        if flat and not (self.seq and self.seq_pad):
            raise ValueError("flat [M, D] input needs seq and seq_pad set")

        y = FusedLayerNorm(out_dtype=self.compute_dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * d, dtype=self.compute_dtype, name="qkv")(y)
        # packed qkv goes straight into the attention kernel — the
        # per-head q/k/v column slicing happens inside it
        if flat:
            qkv3 = qkv.reshape(-1, self.seq_pad, 3 * d)  # free bitcast
            o = fused_attention_qkv(qkv3, self.num_heads, kv_len=self.seq)
            o = o.reshape(-1, d)  # free bitcast
        else:
            o = fused_attention_qkv(qkv, self.num_heads)
        o = nn.Dense(d, dtype=self.compute_dtype, name="out")(o)
        x = x + o.astype(x.dtype)

        y = FusedLayerNorm(out_dtype=self.compute_dtype, name="ln_2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.compute_dtype, name="mlp_1")(y)
        # torch nn.GELU default is the exact erf form, not tanh
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(d, dtype=self.compute_dtype, name="mlp_2")(y)
        return x + y.astype(x.dtype)


class VisionTransformer(nn.Module):
    """torchvision-topology ViT; same call signature as models.ResNet.

    ``num_classes=None`` yields the feature-extractor head (the final-LN
    class token, ``hidden_dim``-D). ``mask`` is accepted for engine
    compatibility and ignored — LayerNorm is per-sample, so padded rows
    cannot contaminate valid rows (the reason ResNet needs MaskedBatchNorm).
    """

    patch_size: int = 16
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    num_classes: Optional[int] = None
    compute_dtype: Any = jnp.float32
    # rematerialize each encoder block on the backward pass
    # (jax.checkpoint): activation memory drops from O(layers) to O(1)
    # blocks at ~1/3 extra forward FLOPs — the standard trade when HBM,
    # not MXU time, caps the train batch size. No effect on inference.
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
        del train, mask  # no dropout (torchvision default 0.0), no batch stats
        b, h, w, c = x.shape
        p = self.patch_size
        if h % p or w % p:
            raise ValueError(
                f"image size {h}x{w} not divisible by patch size {p}"
            )
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

        # Flat padded stream: pad the token axis once (pad rows start as
        # exact zeros and stay finite — LN maps them to its bias, attention
        # masks them as keys), then run the whole encoder rank-2. Real
        # rows' math matches the 3-D layout to fp-reduction tolerance; the
        # payoff is zero relayout copies between GEMMs and Pallas calls.
        seq = x.shape[1]
        seq_pad = round_up(seq, _SEQ_PAD_MULTIPLE)
        if seq_pad != seq:
            x = jnp.pad(x, ((0, 0), (0, seq_pad - seq), (0, 0)))
        x = x.reshape(b * seq_pad, self.hidden_dim)

        block_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        for i in range(self.num_layers):
            x = block_cls(
                num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                compute_dtype=self.compute_dtype, seq=seq, seq_pad=seq_pad,
                name=f"block{i}",
            )(x)
        x = x.reshape(b, seq_pad, self.hidden_dim)

        # LayerNorm is per-row, so normalizing only the class token equals
        # torchvision's normalize-then-slice — 1/(tokens) the work, and the
        # tiny [B, D] f32 LN costs nothing
        features = FusedLayerNorm(out_dtype=jnp.float32, name="ln")(
            x[:, 0].astype(jnp.float32)
        )
        if self.num_classes is None:
            return features
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(features)
        if return_features:
            return logits, features
        return logits


# (hidden, layers, heads, mlp). b16 is torchvision vit_b_16; s16/t16 follow
# the standard ViT-S/Ti recipe (DeiT) with the same 64-wide heads.
VIT_CONFIGS = {
    "vit_b16": dict(
        patch_size=16, hidden_dim=768, num_layers=12, num_heads=12, mlp_dim=3072
    ),
    "vit_s16": dict(
        patch_size=16, hidden_dim=384, num_layers=12, num_heads=6, mlp_dim=1536
    ),
    "vit_t16": dict(
        patch_size=16, hidden_dim=192, num_layers=12, num_heads=3, mlp_dim=768
    ),
}


def _factory(name: str):
    cfg = VIT_CONFIGS[name]

    def make(
        num_classes: Optional[int] = None,
        compute_dtype: Any = jnp.float32,
        remat: bool = False,
    ):
        return VisionTransformer(
            num_classes=num_classes, compute_dtype=compute_dtype,
            remat=remat, **cfg,
        )

    make.__name__ = name
    return make


VIT_FACTORIES = {name: _factory(name) for name in VIT_CONFIGS}

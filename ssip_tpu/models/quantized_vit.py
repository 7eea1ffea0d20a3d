"""Post-training int8 quantization for the frozen ViT extractor.

The ViT counterpart of ``models.quantized`` (see that module for the MXU
s8×s8→s32 rationale — measured ~2× the bf16 rate on ≥128-channel shapes,
which EVERY ViT dense layer has). ~100% of a ViT's FLOPs are dense
matmuls, so the whole compute path quantizes:

1. weights quantize **per output channel** symmetric int8 at four sites
   per encoder block (the fused ``qkv``, attention ``out``, ``mlp_1``,
   ``mlp_2``) plus the patch-embedding conv;
2. activations quantize **per tensor** symmetric int8 at each site input,
   scales calibrated from one f32 forward over real data;
3. each site computes ``dot_s32(x_q, W_q) · (s_x·s_w) + b``; LayerNorms,
   residual adds, GELU, and softmax-attention run in f32/``inter_dtype``
   (they are a rounding-sensitive few % of the FLOPs — the same
   full-precision-epilogue policy as the ResNet path).

Throughput mode, not a parity mode: the noise envelope (cosine similarity
vs the f32 chain, logit agreement) is pinned in tests/test_quantized_vit.py.
The reference has no ViT (reference src/training/common.py:299-304); this
backs ``--compute-dtype int8 --arch vit_*`` on the extraction CLI.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ssip_tpu.models.vit import LN_EPS, VIT_CONFIGS, round_up as _round_up
from ssip_tpu.ops.attention import fused_attention_qkv
from ssip_tpu.ops.layernorm import layer_norm

_QMAX = 127.0


def _ln(x: jax.Array, p: Dict[str, Any]) -> jax.Array:
    """LayerNorm (eps 1e-6): f32 moments, result in the stream's dtype.

    Keeping the quantized path's inter-site stream bf16-resident (instead
    of the old materialized-f32 LN) removes the same convert stalls the
    dense ViT had (ops/layernorm.py) — the f32 epilogue share was the
    round-3 Amdahl cap on int8 ViT gains.
    """
    return layer_norm(x, p["scale"], p["bias"], eps=LN_EPS)


def _quant(x: jax.Array, inv_scale: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    return jnp.clip(jnp.round(x * inv_scale), -_QMAX, _QMAX).astype(jnp.int8)


def _qdense(x_q: jax.Array, site: Dict[str, Any]) -> jax.Array:
    """s8×s8→s32 [..., in] @ [in, out] + f32 per-channel dequant affine."""
    y32 = jax.lax.dot_general(
        x_q, site["kernel"],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y32.astype(jnp.float32) * site["mult"] + site["bias"]


def _vit_flow(tree: Dict[str, Any], x: jax.Array, cfg: Dict[str, int],
              *, site_fn, stem_fn, inter_dtype, mlp_fn=None,
              pad_stream: bool = True) -> jax.Array:
    """Shared control flow of the calibration and quantized forwards.

    ``stem_fn(x, stem_site)`` and ``site_fn(t, block_sites, name)`` abstract
    "run this dense site" — the f32 calibration pass records each input's
    max inside them, the int8 pass quantizes and runs s8 matmuls. Keeping
    ONE flow guarantees every calibrated scale corresponds to exactly the
    tensor the int8 path quantizes. ``mlp_fn(y, blk)`` overrides the MLP
    sublayer (the fused Pallas int8 MLP, ops/qmlp.py); the default is the
    unfused mlp_1 → GELU → mlp_2 site composition.

    ``pad_stream``: run the encoder in the flat padded [B·S_pad, D] layout
    (models/vit.py's round-5 discipline — rank-2 GEMMs leave XLA no
    relayout choices; attention masks the pad keys via ``kv_len``).
    Calibration runs with ``pad_stream=False`` so per-tensor maxima come
    from real rows only; the pad rows the int8 pass then sees may clip,
    which is harmless — they are garbage the final slice discards.
    """
    d, heads = cfg["hidden_dim"], cfg["num_heads"]
    b = x.shape[0]
    x = stem_fn(x, tree["stem"])  # [B, h, w, D] f32
    x = x.reshape(b, -1, d)
    cls = jnp.broadcast_to(jnp.asarray(tree["cls_token"]), (b, 1, d))
    x = jnp.concatenate([cls.astype(x.dtype), x], axis=1)
    x = x + jnp.asarray(tree["pos_embedding"]).astype(x.dtype)
    s = x.shape[1]
    s_pad = _round_up(s, 16) if pad_stream else s
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    x = x.reshape(b * s_pad, d)

    for blk in tree["blocks"]:
        y = _ln(x, blk["ln_1"])
        qkv = site_fn(y, blk, "qkv")  # [M, 3D] f32
        # packed qkv feeds the attention kernel directly (column order
        # [3, H, Dh] — the same layout contract as models/vit.py); the
        # [M, 3D] → [B, S_pad, 3D] reshape is a free bitcast (S_pad % 16)
        qkv3 = qkv.astype(inter_dtype).reshape(b, s_pad, 3 * d)
        o = fused_attention_qkv(qkv3, heads, kv_len=s if s_pad != s else 0)
        o = site_fn(o.reshape(b * s_pad, d), blk, "out")
        x = (x.astype(jnp.float32) + o).astype(inter_dtype)

        y = _ln(x, blk["ln_2"])
        if mlp_fn is None:
            y = site_fn(y, blk, "mlp_1")
            y = jax.nn.gelu(y, approximate=False)
            y = site_fn(y, blk, "mlp_2")
        else:
            y = mlp_fn(y, blk)
        x = (x.astype(jnp.float32) + y).astype(inter_dtype)

    x = x.reshape(b, s_pad, d)
    # rowwise LN: normalize only the class token (== normalize-then-slice).
    # Upcast BEFORE the LN: _ln returns the stream dtype, so an int8/bf16
    # path would otherwise bf16-round the published features — the [B, D]
    # f32 LN costs nothing and matches models/vit.py's final-LN discipline.
    return _ln(x[:, 0].astype(jnp.float32), tree["ln"])


def _f32_tree(variables: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Flax ViT params → this module's flat site layout (f32 numpy)."""
    p = variables["params"]

    def dense(mod):
        return {
            "kernel": np.asarray(mod["kernel"], np.float64),
            "bias": np.asarray(mod["bias"], np.float32),
        }

    return {
        "stem": {
            "kernel": np.asarray(p["conv_proj"]["kernel"], np.float64),
            "bias": np.asarray(p["conv_proj"]["bias"], np.float32),
        },
        "cls_token": np.asarray(p["cls_token"], np.float32),
        "pos_embedding": np.asarray(p["pos_embedding"], np.float32),
        "blocks": [
            {
                "ln_1": {k: np.asarray(v, np.float32) for k, v in p[f"block{i}"]["ln_1"].items()},
                "ln_2": {k: np.asarray(v, np.float32) for k, v in p[f"block{i}"]["ln_2"].items()},
                **{m: dense(p[f"block{i}"][m]) for m in ("qkv", "out", "mlp_1", "mlp_2")},
            }
            for i in range(num_layers)
        ],
        "ln": {k: np.asarray(v, np.float32) for k, v in p["ln"].items()},
    }


def quantize_vit_extractor(
    variables: Dict[str, Any],
    calibration_batch: jax.Array,
    arch: str = "vit_b16",
) -> Dict[str, Any]:
    """variables + one normalized [B,H,W,3] batch → int8 inference tree.

    Each dense site carries ``kernel`` (int8 [in, out] / patch conv HWIO),
    ``mult`` (f32 [out] = s_x·s_w), ``bias`` (f32 [out]) and
    ``inv_in_scale`` (f32 scalar).
    """
    cfg = VIT_CONFIGS[arch]
    f32 = _f32_tree(variables, cfg["num_layers"])

    # --- calibration: f32 flow, recording per-site input maxima ---------
    maxima: Dict[int, Dict[str, float]] = {}
    stem_max = [0.0]

    def conv_f32(x, stem):
        p = cfg["patch_size"]
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), jnp.asarray(stem["kernel"], jnp.float32),
            (p, p), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + jnp.asarray(stem["bias"])

    def stem_cal(x, stem):
        stem_max[0] = float(jnp.max(jnp.abs(x)))
        return conv_f32(x, stem)

    blk_index = {id(blk): i for i, blk in enumerate(f32["blocks"])}

    def site_cal(t, blk, name):
        maxima.setdefault(blk_index[id(blk)], {})[name] = float(
            jnp.max(jnp.abs(t))
        )
        return jnp.asarray(
            np.asarray(t, np.float32) @ np.asarray(blk[name]["kernel"], np.float32)
            + blk[name]["bias"]
        )

    _vit_flow(
        f32, calibration_batch.astype(jnp.float32), cfg,
        site_fn=site_cal, stem_fn=stem_cal, inter_dtype=jnp.float32,
        pad_stream=False,
    )

    # --- quantize weights with the calibrated input scales --------------
    def qsite(site, max_abs: float):
        s_x = (max_abs / _QMAX) or 1.0
        k = site["kernel"]
        s_w = np.max(np.abs(k), axis=tuple(range(k.ndim - 1))) / _QMAX
        s_w = np.where(s_w == 0.0, 1.0, s_w)
        k_q = np.clip(np.rint(k / s_w), -_QMAX, _QMAX).astype(np.int8)
        return {
            "kernel": jnp.asarray(k_q),
            "mult": jnp.asarray((s_x * s_w).astype(np.float32)),
            "bias": jnp.asarray(site["bias"]),
            "inv_in_scale": jnp.float32(1.0 / s_x),
        }

    return {
        "stem": qsite(f32["stem"], stem_max[0]),
        "cls_token": jnp.asarray(f32["cls_token"]),
        "pos_embedding": jnp.asarray(f32["pos_embedding"]),
        "blocks": [
            {
                "ln_1": {k: jnp.asarray(v) for k, v in blk["ln_1"].items()},
                "ln_2": {k: jnp.asarray(v) for k, v in blk["ln_2"].items()},
                **{
                    m: qsite(blk[m], maxima[i][m])
                    for m in ("qkv", "out", "mlp_1", "mlp_2")
                },
            }
            for i, blk in enumerate(f32["blocks"])
        ],
        "ln": {k: jnp.asarray(v) for k, v in f32["ln"].items()},
    }


def make_quantized_vit_apply(
    arch: str = "vit_b16",
    inter_dtype: Any = jnp.bfloat16,
    stem_prequantized: bool = False,
) -> Callable[[Dict[str, Any], jax.Array], jax.Array]:
    """apply(qtree, x_normalized_nhwc) → class-token features [B, D] f32.

    ``stem_prequantized``: the input is already the patch conv's int8
    operand (the fused Pallas preproc epilogue quantizes with
    ``stem.inv_in_scale`` on TPU — same contract as the ResNet path).
    """
    cfg = VIT_CONFIGS[arch]
    p = cfg["patch_size"]

    def stem_q(x, stem):
        x_q = x if stem_prequantized else _quant(x, stem["inv_in_scale"])
        y32 = jax.lax.conv_general_dilated(
            x_q, stem["kernel"], (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return y32.astype(jnp.float32) * stem["mult"] + stem["bias"]

    def site_q(t, blk, name):
        site = blk[name]
        return _qdense(_quant(t, site["inv_in_scale"]), site)

    from ssip_tpu.ops.qmlp import quantized_mlp

    def apply(qtree: Dict[str, Any], x: jax.Array) -> jax.Array:
        return _vit_flow(
            qtree, x, cfg,
            site_fn=site_q, stem_fn=stem_q, inter_dtype=inter_dtype,
            # fused Pallas MLP on TPU (hidden never touches HBM); on
            # CPU/GPU quantized_mlp falls back to exactly the site_q
            # composition above
            mlp_fn=quantized_mlp,
        )

    return apply

"""GPipe-style pipeline parallelism for the ViT encoder family.

The reference has no pipeline parallelism — or any model bigger than one
device (SURVEY §2.2; reference src/training/common.py:299-304 is a lone
torchvision resnet18). PP was therefore documented N/A while ResNet-18 was
the only backbone. The ViT family (models/vit.py) changes that: a deep
stack of structurally identical encoder blocks is exactly the shape PP
wants, so this module adds it as real TPU-native capability.

Design — the idiomatic JAX pipeline recipe (scaling-book style), not a
torch-style stage scheduler:

* **Stages are mesh shards.** The ``num_layers`` encoder blocks are stacked
  leaf-wise into a ``[S, L/S, ...]`` pytree whose leading (stage) axis is
  sharded over the mesh ``model`` axis — each device holds 1/S of the
  encoder parameters (and, in a train step, 1/S of the optimizer moments):
  genuine memory scaling, not a compute-only demo.
* **The schedule is one ``lax.scan``.** Inside ``jax.shard_map`` every tick
  runs each stage's blocks on the microbatch it currently holds, then
  rotates activations one step around the ring with ``lax.ppermute``.
  ``M`` microbatches drain in ``M + S - 1`` ticks (bubble fraction
  ``(S-1)/(M+S-1)`` — the classic GPipe trade; raise M to amortize).
* **The backward pipeline is free.** Everything is functional, so
  ``jax.grad`` differentiates straight through the ring: the transpose of
  ``ppermute`` is the reverse rotation and the transpose of the schedule
  scan is the reverse schedule. No hand-written backward pass, no manual
  send/recv — XLA emits the collectives.

Patch embedding and the final-LN/head are tiny (a few % of FLOPs) and run
data-parallel outside the ring, replicated over the stage axis; only the
encoder blocks — ~99% of ViT FLOPs — pipeline.

The produced ``apply_fn`` matches the training engine's model contract
(``apply_fn(variables, x, train=, mask=, mutable=)``), so the stock
``make_train_step`` / ``eval_step`` drive a pipelined model unchanged; the
parameter tree is ``{"outer": ..., "stacked": ...}`` with
``merge_stage_params`` converting back to the plain ViT layout for
checkpoints and torch export.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssip_tpu.models.vit import LN_EPS, EncoderBlock, VisionTransformer
from ssip_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def split_stage_params(
    params: dict, num_layers: int, num_stages: int
) -> Tuple[dict, Any]:
    """Split a plain ViT param tree into ``(outer, stacked)``.

    ``outer`` keeps the non-block params (conv_proj, cls_token,
    pos_embedding, final ln, fc); ``stacked`` holds every encoder block
    stacked leaf-wise to ``[num_stages, num_layers/num_stages, ...]`` —
    the layout whose leading axis shards over the mesh ``model`` axis.
    """
    if num_layers % num_stages:
        raise ValueError(
            f"{num_layers} encoder blocks not divisible into {num_stages} stages"
        )
    block_names = {f"block{i}" for i in range(num_layers)}
    missing = block_names - set(params)
    if missing:
        raise ValueError(f"param tree is missing encoder blocks: {sorted(missing)}")
    blocks = [params[f"block{i}"] for i in range(num_layers)]
    per = num_layers // num_stages
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs).reshape(num_stages, per, *xs[0].shape), *blocks
    )
    outer = {k: v for k, v in params.items() if k not in block_names}
    return outer, stacked


def merge_stage_params(outer: dict, stacked: Any) -> dict:
    """Inverse of :func:`split_stage_params` — back to the plain ViT layout
    (for checkpointing, torch export, and parity tests)."""
    leaves = jax.tree.leaves(stacked)
    num_stages, per = leaves[0].shape[0], leaves[0].shape[1]
    flat = jax.tree.map(
        lambda a: a.reshape(num_stages * per, *a.shape[2:]), stacked
    )
    params = dict(outer)
    for i in range(num_stages * per):
        params[f"block{i}"] = jax.tree.map(lambda a: a[i], flat)
    return params


def pp_param_shardings(mesh: Mesh, pp_params: Any) -> Any:
    """NamedShardings for a ``{"outer", "stacked"}`` tree: stacked stage
    params shard their leading axis over ``model``; outer replicates.
    Shape-based (stacked leaves are the ones under the "stacked" key), so
    the same rule maps optimizer moments via ``jax.tree.map``."""
    return {
        "outer": jax.tree.map(
            lambda _: NamedSharding(mesh, P()), pp_params["outer"]
        ),
        "stacked": jax.tree.map(
            lambda _: NamedSharding(mesh, P(MODEL_AXIS)), pp_params["stacked"]
        ),
    }


def _patch_embed(outer: dict, x: jnp.ndarray, model: VisionTransformer):
    """conv_proj → prepend cls → + pos, exactly as VisionTransformer.__call__.

    The patch conv is stride == kernel == patch_size, i.e. one GEMM over
    non-overlapping patches: reshape to (ph, pw, c)-major patch vectors and
    multiply by the HWIO kernel flattened the same way (bitwise the same
    contraction order as ``nn.Conv``'s im2col lowering).
    """
    ct = model.compute_dtype
    p, d = model.patch_size, model.hidden_dim
    b, h, w, c = x.shape
    k = outer["conv_proj"]["kernel"].astype(ct)  # [p, p, c, D] (HWIO)
    xp = (
        x.astype(ct)
        .reshape(b, h // p, p, w // p, p, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, (h // p) * (w // p), p * p * c)
    )
    tok = xp @ k.reshape(p * p * c, d) + outer["conv_proj"]["bias"].astype(ct)
    cls = jnp.broadcast_to(outer["cls_token"], (b, 1, d)).astype(tok.dtype)
    tok = jnp.concatenate([cls, tok], axis=1)
    return tok + outer["pos_embedding"].astype(tok.dtype)


def _final_head(outer: dict, tok: jnp.ndarray, return_features: bool = False):
    """Final LayerNorm → class token → (optional) fc head, in f32."""
    x = tok.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + LN_EPS)
    x = x * outer["ln"]["scale"] + outer["ln"]["bias"]
    features = x[:, 0]
    if "fc" not in outer:
        return features
    logits = features @ outer["fc"]["kernel"] + outer["fc"]["bias"]
    if return_features:
        return logits, features
    return logits


def make_pipelined_vit_forward(
    model: VisionTransformer, mesh: Mesh, num_microbatches: int
):
    """Build ``forward(outer, stacked, x) -> features|logits``.

    ``stacked`` leaves are ``[S, L/S, ...]`` with S = mesh model-axis size;
    ``x`` is the normalized image batch, sharded (or shardable) over the
    data axis. Batch must divide by ``num_microbatches`` and the microbatch
    by the data-axis size (static shapes — XLA requirement).
    """
    num_stages = int(mesh.shape[MODEL_AXIS])
    if model.num_layers % num_stages:
        raise ValueError(
            f"{model.num_layers} layers not divisible by {num_stages} stages"
        )
    block = EncoderBlock(
        num_heads=model.num_heads,
        mlp_dim=model.mlp_dim,
        compute_dtype=model.compute_dtype,
    )
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def stage_apply(blocks: Any, h: jnp.ndarray) -> jnp.ndarray:
        # blocks: this stage's [L/S, ...] params — scan over the layer axis
        def body(carry, bp):
            return block.apply({"params": bp}, carry), None

        h, _ = jax.lax.scan(body, h, blocks)
        return h

    def ring(stacked_local: Any, x_mb: jnp.ndarray) -> jnp.ndarray:
        # stacked_local leaves: [1, L/S, ...] (this shard's stage) — squeeze
        blocks = jax.tree.map(lambda a: a[0], stacked_local)
        stage = jax.lax.axis_index(MODEL_AXIS)
        m = x_mb.shape[0]
        # the loop carry becomes stage-varying after the first ppermute —
        # mark the zero-init the same way so the scan carry types match
        buf = jax.lax.pcast(
            jnp.zeros_like(x_mb[0]), (MODEL_AXIS,), to="varying"
        )
        outs = jax.lax.pcast(jnp.zeros_like(x_mb), (MODEL_AXIS,), to="varying")

        def tick(carry, t):
            buf, outs = carry
            mb_in = jax.lax.dynamic_index_in_dim(
                x_mb, jnp.minimum(t, m - 1), keepdims=False
            )
            inp = jnp.where(stage == 0, mb_in, buf)
            y = stage_apply(blocks, inp)
            # the last stage commits microbatch t-(S-1) once it's full
            out_idx = jnp.clip(t - (num_stages - 1), 0, m - 1)
            write = jnp.logical_and(stage == num_stages - 1, t >= num_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, out_idx, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, cur), out_idx, 0
            )
            buf = jax.lax.ppermute(y, MODEL_AXIS, perm)
            return (buf, outs), None

        (buf, outs), _ = jax.lax.scan(
            tick, (buf, outs), jnp.arange(m + num_stages - 1)
        )
        # only the last stage holds real outputs (others are zeros) — psum
        # broadcasts them ring-wide so the result is stage-invariant
        return jax.lax.psum(outs, MODEL_AXIS)

    sharded_ring = jax.shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
    )

    def forward(
        outer: dict, stacked: Any, x: jnp.ndarray, return_features: bool = False
    ):
        tok = _patch_embed(outer, x, model)
        b, t, d = tok.shape
        if b % num_microbatches:
            raise ValueError(
                f"batch {b} not divisible into {num_microbatches} microbatches"
            )
        mb = b // num_microbatches
        outs = sharded_ring(stacked, tok.reshape(num_microbatches, mb, t, d))
        return _final_head(outer, outs.reshape(b, t, d), return_features)

    return forward


def make_pp_apply_fn(
    model: VisionTransformer, mesh: Mesh, num_microbatches: int
):
    """Training-engine-compatible ``apply_fn`` over ``{"outer","stacked"}``
    params — drives the stock ``make_train_step`` / ``eval_step`` unchanged
    (ViT is stat-free, so the mutable collection is always empty)."""
    forward = make_pipelined_vit_forward(model, mesh, num_microbatches)

    def apply_fn(
        variables, x, train=False, mask=None, mutable=None, return_features=False
    ):
        del train, mask  # stat-free + per-sample norms, as in models/vit.py
        p = variables["params"]
        out = forward(p["outer"], p["stacked"], x, return_features)
        if mutable:
            return out, {}
        return out

    return apply_fn

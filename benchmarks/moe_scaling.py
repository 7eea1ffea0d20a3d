"""Expert-count scaling: where does the MoE pay? (round-4 verdict task 6)

The round-4 comparator rows showed dense ViT-S/16 beating the 8-expert
MoE on BOTH embed throughput and train step rate — an honest loss with no
published winning regime. This harness measures the regime claim the MoE
module actually makes (models/moe.py): Switch-style top-1 routing keeps
per-token expert FLOPs CONSTANT as the expert count grows, so parameters
scale linearly while step time should stay ~flat — "more capacity at the
same step budget" is the win, not raw imgs/s at equal capacity.

For dense ViT-S/16 and vit_moe_s16 at E ∈ {8, 16, 32}: embed imgs/s
(batch 128, fused preproc), train steps/s (fused-epoch engine incl.
router aux/z losses), parameter counts, and the derived params·imgs/s
capacity-throughput product. One executable, reps amortized inside jit
(this box's tunnel jitter discipline — benchmarks/common.py).

Writes outputs/notes/moe_scaling.md and prints one JSON line.

Usage: python benchmarks/moe_scaling.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny shapes (CPU smoke)")
    ap.add_argument(
        "--experts", type=int, nargs="+", default=[8, 16, 32],
        help="expert counts to sweep",
    )
    args = ap.parse_args()

    if args.quick:
        # --quick is the CPU smoke: force the CPU platform BEFORE any
        # backend touch so a smoke run can NEVER grab the TPU (two TPU
        # programs must not run concurrently on this box — CLAUDE.md)
        from ssip_tpu.runtime.device import force_cpu_platform_if_requested

        force_cpu_platform_if_requested("cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.common import measure_rate
    from ssip_tpu.models import MODEL_FACTORIES
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.ops.pallas_preproc import preprocess_images_pallas
    from ssip_tpu.ops.resize import extraction_preprocess
    from ssip_tpu.train.engine import (
        TrainState, make_fused_epoch, make_optimizer,
    )

    on_tpu = jax.default_backend() == "tpu"
    img = 224  # the preproc chain always emits 224-crops (pos_embedding is sized to it)
    B = 128 if not args.quick else 4
    NB = 4 if not args.quick else 2
    steps_override = None if not args.quick else 1
    LO, HI = (2, 8) if on_tpu else (1, 2)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.integers(0, 256, (NB, B, 512, 512, 3), dtype=np.uint8)
    )

    def n_params(tree) -> int:
        return int(sum(x.size for x in jax.tree.leaves(tree)))

    def embed_rate(model, variables):
        @partial(jax.jit, static_argnames="reps")
        def loop(batches, tree, reps):
            def body(_, acc):
                def step(c, u8):
                    x = (
                        preprocess_images_pallas(u8, out_dtype=jnp.bfloat16)
                        if on_tpu
                        else extraction_preprocess(u8, dtype=jnp.bfloat16)
                    )
                    return c + jnp.sum(
                        model.apply(tree, x, train=False).astype(jnp.float32)
                    ), None
                c, _ = jax.lax.scan(step, acc, batches)
                return c
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        tree = jax.device_put(variables)
        return measure_rate(
            lambda r: loop(raw, tree, r), LO, HI, items_per_rep=NB * B
        )

    def train_rate(model, variables):
        fused = make_fused_epoch(augment=True)
        state = TrainState.create(
            apply_fn=model.apply, params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            tx=make_optimizer(1e-4, 1e-4),
        )
        steps = steps_override or (8 if on_tpu else 2)
        imgs = jnp.asarray(
            rng.integers(0, 256, (steps, B, img, img, 3), dtype=np.uint8)
        )
        labels = jnp.asarray(rng.integers(0, 2, (steps, B)).astype(np.int32))
        valid = jnp.ones((steps, B), bool)
        keys = jax.random.split(jax.random.key(0), steps)

        @partial(jax.jit, static_argnames="reps")
        def prog(s, reps):
            def body(_, carry):
                s2, _losses, _preds = fused(carry, imgs, labels, valid, keys)
                return s2
            out = jax.lax.fori_loop(0, reps, body, s)
            # depend on the trained PARAMS — returning only the step
            # counter lets XLA dead-code-eliminate the whole computation
            # (run_benchmarks.py measured 240k "steps/s" that way)
            return jax.tree_util.tree_reduce(
                lambda a, leaf: a + jnp.sum(leaf.astype(jnp.float32)),
                out.params, jnp.float32(0.0),
            )

        return measure_rate(
            lambda r: prog(state, reps=int(r)), LO, max(LO + 1, HI // 2),
            items_per_rep=steps, max_trials=8,
        )

    rows = []

    def add_row(name, model, variables, experts):
        er = embed_rate(model, variables)
        tr = train_rate(model, variables)
        p = n_params(variables["params"])
        rows.append({
            "model": name, "experts": experts, "params_m": p / 1e6,
            "embed_imgs_per_sec": er.median, "embed_spread": er.spread,
            "train_steps_per_sec": tr.median, "train_spread": tr.spread,
        })
        print(f"{name}: {p/1e6:.1f}M params, embed {er.median:.0f} imgs/s "
              f"(±{er.spread*50:.0f}%), train {tr.median:.1f} steps/s "
              f"(±{tr.spread*50:.0f}%)", flush=True)

    dense = MODEL_FACTORIES["vit_s16"](num_classes=2, compute_dtype=jnp.bfloat16)
    add_row("vit_s16 (dense)", dense,
            seeded_init_host(dense, 42, (1, img, img, 3)), 0)
    for e in args.experts:
        moe = MODEL_FACTORIES["vit_moe_s16"](
            num_classes=2, compute_dtype=jnp.bfloat16, num_experts=e
        )
        add_row(f"vit_moe_s16 E={e}", moe,
                seeded_init_host(moe, 42, (1, img, img, 3)), e)

    base = rows[0]
    lines = [
        "# MoE expert-count scaling (ViT-S/16 tower, Switch top-1 routing)",
        "",
        "Measured on " + str(jax.devices()[0]) + f", batch {B}, bf16, "
        "fused preproc embed + fused-epoch train (incl. router aux/z "
        "losses). Top-1 routing holds per-token expert FLOPs constant as "
        "experts scale; parameters grow linearly — the capacity-per-step "
        "regime the MoE module exists for (models/moe.py).",
        "",
        "| model | params | embed imgs/s | train steps/s | params×(steps/s) "
        "vs dense |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        cap = (r["params_m"] * r["train_steps_per_sec"]) / (
            base["params_m"] * base["train_steps_per_sec"]
        )
        lines.append(
            f"| {r['model']} | {r['params_m']:.1f}M "
            f"| {r['embed_imgs_per_sec']:.0f} (±{r['embed_spread']*50:.0f}%) "
            f"| {r['train_steps_per_sec']:.1f} (±{r['train_spread']*50:.0f}%) "
            f"| {cap:.2f}× |"
        )
    out = REPO / "outputs/notes/moe_scaling.md"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()

"""Full benchmark harness: BASELINE-style table across the hot paths.

Measures (on the current default backend, amortized-and-differenced per the
shared-tunnel methodology in benchmarks/common.py and docs/performance.md):

  1. fused Pallas preprocessing throughput,
  2. frozen ResNet-18 embedding throughput (preproc + forward), bf16 & f32 —
     same window/batch parameters as the driver's ``bench.py`` so the two
     published numbers agree,
  3. SSL train step/sec (fused-epoch supervised step, batch 16 & 64),
  4. host decode rate (native / PIL),
  5. TRUE cold end-to-end extraction (disk → decode → H2D → embed) across
     the sequential / streamed / host-preproc / turbo execution shapes,

and writes ``outputs/notes/benchmarks.md`` + ``outputs/notes/benchmarks.json``
next to the reference numbers from BASELINE.md.

Usage: ``python benchmarks/run_benchmarks.py [--quick]``
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from benchmarks.common import log, measure_e2e_extraction, measure_rate

REFERENCE = {
    "reference_extraction_imgs_per_sec": 359.0,  # BASELINE.md end-to-end
    "target_imgs_per_sec_chip": 5000.0,
}
CORPUS = Path("/root/reference/mri_dataset_brain_cancer_oc")


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--quick", action="store_true")
    parser.add_argument(
        "--only-vit", action="store_true",
        help="measure only the ViT rows (bf16 fused-attention, int8 PTQ, "
        "MoE + dense-S/16 embed, dense-vs-MoE train steps) and merge them "
        "into the existing benchmarks.json — refreshes the ViT family "
        "without re-running the whole (hour-scale) harness",
    )
    parser.add_argument(
        "--only-vit-train", action="store_true",
        help="measure only the dense-vs-MoE ViT train rows and merge them "
        "into the existing benchmarks.json (subset of --only-vit)",
    )
    parser.add_argument(
        "--skip-e2e", action="store_true",
        help="skip the (slow, weather-bound) cold e2e extraction section; "
        "on-chip + train + decode numbers still run",
    )
    parser.add_argument("--output-dir", type=Path, default=REPO / "outputs")
    parser.add_argument(
        "--device", default="auto",
        help="auto|cpu — cpu restricts backend discovery to the host "
        "plugin BEFORE any backend touch, so the harness stays runnable "
        "when the accelerator transport is down (same escape hatch as the "
        "pipeline CLIs; the JAX_PLATFORMS env var alone is ineffective "
        "when jax is pre-imported at interpreter startup)",
    )
    args = parser.parse_args()
    if args.quick and (args.only_vit or args.only_vit_train):
        # --quick shrinks the measurement windows to smoke size; merging
        # those into the published benchmarks.{json,md} would present
        # non-publishable numbers as measurements (advisor round-3 finding)
        parser.error("--quick and --only-vit(-train) are mutually "
                     "exclusive: they write into the published table")

    from ssip_tpu.runtime.device import force_cpu_platform_if_requested

    force_cpu_platform_if_requested(args.device)

    from ssip_tpu.runtime.jaxconfig import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssip_tpu.models import ResNet18
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.ops.pallas_preproc import preprocess_images_pallas
    from ssip_tpu.ops.resize import extraction_preprocess

    on_tpu = jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    # identical parameters to bench.py on TPU so the numbers reconcile;
    # --quick shrinks the windows (smoke mode, not a publishable run)
    if args.quick:
        B, NB = (128, 2) if on_tpu else (16, 2)
        LO, HI = (2, 12) if on_tpu else (1, 3)
    else:
        B = 128 if on_tpu else 16  # measured v5e optimum (see bench.py)
        NB = 8 if on_tpu else 2
        LO, HI = (2, 50) if on_tpu else (1, 5)
    batches = jnp.asarray(
        rng.integers(0, 256, (NB, B, 512, 512, 3), dtype=np.uint8)
    )
    jax.block_until_ready(batches)
    results: dict[str, object] = {}

    import math

    def record(key: str, res) -> None:
        results[key] = res.median
        # inf spread (no valid trials) must not leak into benchmarks.json —
        # json.dumps would emit non-strict `Infinity`
        results[key + "_spread"] = (
            round(res.spread, 4) if math.isfinite(res.spread) else None
        )
        log(f"{key}: {res}")

    # 1. preprocessing
    @partial(jax.jit, static_argnames="reps")
    def pp_loop(batches, reps):
        def body(_, acc):
            def step(c, u8):
                x = (
                    preprocess_images_pallas(u8, out_dtype=jnp.bfloat16)
                    if on_tpu
                    else extraction_preprocess(u8, dtype=jnp.bfloat16)
                )
                return c + jnp.sum(x.astype(jnp.float32)), None
            c, _ = jax.lax.scan(step, acc, batches)
            return c
        return jax.lax.fori_loop(0, reps, body, 0.0)

    if not (args.only_vit or args.only_vit_train):
        record(
            "preprocess_imgs_per_sec",
            measure_rate(
                lambda r: pp_loop(batches, r), LO, HI, items_per_rep=NB * B
            ),
        )

    # 2. embedding throughput: shipped plain bf16, the manual folded-BN/s2d
    #    variant (kept as a measured record), and the f32 parity mode
    from ssip_tpu.models.inference import fold_resnet_extractor, make_folded_apply

    host_variables = seeded_init_host(
        ResNet18(num_classes=None), 42, (1, 224, 224, 3)
    )

    def embed_variant(name, apply_fn, tree, dtype, hi, raw=False):
        # raw=True: apply_fn(tree, u8) owns its whole step (used by the
        # int8 path whose preproc kernel fuses the quantization).
        @partial(jax.jit, static_argnames="reps")
        def embed_loop(batches, tree, reps):
            def body(_, acc):
                def step(c, u8):
                    if raw:
                        return c + jnp.sum(apply_fn(tree, u8)), None
                    x = (
                        preprocess_images_pallas(u8, out_dtype=dtype)
                        if on_tpu
                        else extraction_preprocess(u8, dtype=dtype)
                    )
                    return c + jnp.sum(apply_fn(tree, x)), None
                c, _ = jax.lax.scan(step, acc, batches)
                return c
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        record(
            f"embedding_{name}_imgs_per_sec",
            measure_rate(
                lambda r: embed_loop(batches, tree, r), LO, hi,
                items_per_rep=NB * B,
            ),
        )

    # Headline: the shipped plain bf16 forward (measured faster than the
    # manual folded-BN/s2d variant — XLA already fuses inference BN).
    if not (args.only_vit or args.only_vit_train):
        bf16_model = ResNet18(num_classes=None, compute_dtype=jnp.bfloat16)
        embed_variant(
            "bf16",
            lambda v, x: bf16_model.apply(v, x, train=False),
            jax.device_put(host_variables),
            jnp.bfloat16,
            HI,
        )
    if not args.quick and not (args.only_vit or args.only_vit_train):
        folded = jax.device_put(fold_resnet_extractor(host_variables))
        embed_variant(
            "bf16_folded_s2d",
            make_folded_apply(compute_dtype=jnp.bfloat16),
            folded,
            jnp.bfloat16,
            max(LO + 1, HI // 2),
        )
        f32_model = ResNet18(num_classes=None, compute_dtype=jnp.float32)
        embed_variant(
            "f32",
            lambda v, x: f32_model.apply(v, x, train=False),
            jax.device_put(host_variables),
            jnp.float32,
            max(LO + 1, HI // 2),
        )
    # shared int8 calibration batch (ResNet + ViT PTQ sections below) —
    # computed once (advisor round-3: it was built twice, recompiling and
    # re-running the preprocessing of batches[0])
    calib = None
    if not args.quick and not args.only_vit_train:
        calib = (
            preprocess_images_pallas(batches[0], out_dtype=jnp.float32)
            if on_tpu
            else extraction_preprocess(batches[0], dtype=jnp.float32)
        )

    if not args.quick and not (args.only_vit or args.only_vit_train):
        # int8 post-training quantization (models/quantized.py): the MXU's
        # s8×s8→s32 mode — max-throughput approximate mode.
        from ssip_tpu.models.quantized import (
            make_quantized_apply,
            quantize_extractor,
        )

        qtree = jax.device_put(quantize_extractor(host_variables, calib))
        q_apply = make_quantized_apply()
        q_apply_pre = make_quantized_apply(stem_prequantized=True)

        def int8_step(tree, u8):
            if on_tpu:  # fused quantizing preproc kernel (what ships)
                xq = preprocess_images_pallas(
                    u8, quant_inv_scale=tree["stem"]["inv_in_scale"]
                )
                return q_apply_pre(tree, xq)
            return q_apply(
                tree, extraction_preprocess(u8, dtype=jnp.float32)
            )

        embed_variant(
            "int8_ptq", int8_step, qtree, jnp.float32, HI, raw=True
        )

        # ResNet-50 pair (bf16 vs int8 PTQ): the bottleneck 1×1 convs are
        # HBM-bound, so int8 gains come from operand bytes — and the fused
        # requantize epilogue (models/quantized.py) matters most here (two
        # intra-block intermediates per block stay int8).
        from ssip_tpu.models import ResNet50
        from ssip_tpu.models.resnet import MODEL_STAGES

        r50 = ResNet50(num_classes=None, compute_dtype=jnp.bfloat16)
        r50_host = seeded_init_host(r50, 42, (1, 224, 224, 3))
        embed_variant(
            "bf16_r50",
            lambda v, x: r50.apply(v, x, train=False),
            jax.device_put(r50_host),
            jnp.bfloat16,
            max(LO + 1, HI // 2),
        )
        qtree50 = jax.device_put(quantize_extractor(
            r50_host, calib, stage_sizes=MODEL_STAGES["resnet50"],
            bottleneck=True,
        ))
        q50_pre = make_quantized_apply(
            stage_sizes=MODEL_STAGES["resnet50"], bottleneck=True,
            stem_prequantized=True,
        )
        q50 = make_quantized_apply(
            stage_sizes=MODEL_STAGES["resnet50"], bottleneck=True
        )

        def int8_step_r50(tree, u8):
            if on_tpu:
                xq = preprocess_images_pallas(
                    u8, quant_inv_scale=tree["stem"]["inv_in_scale"]
                )
                return q50_pre(tree, xq)
            return q50(tree, extraction_preprocess(u8, dtype=jnp.float32))

        embed_variant(
            "int8_ptq_r50", int8_step_r50, qtree50, jnp.float32,
            max(LO + 1, HI // 2), raw=True,
        )

    if not args.quick:
        # ViT-B/16 bf16 (models/vit.py): all-matmul encoder, fused Pallas
        # attention on TPU (ops/attention.py). ~4.6× the ResNet-18 FLOPs
        # per image, but nearly all of them land on the MXU as large GEMMs.
        from ssip_tpu.models import MODEL_FACTORIES

        # embed rows (skipped by --only-vit-train)
        if not args.only_vit_train:
            vit = MODEL_FACTORIES["vit_b16"](
                num_classes=None, compute_dtype=jnp.bfloat16
            )
            vit_host = seeded_init_host(vit, 42, (1, 224, 224, 3))
            try:
                embed_variant(
                    "bf16_vit_b16",
                    lambda v, x: vit.apply(v, x, train=False),
                    jax.device_put(vit_host),
                    jnp.bfloat16,
                    max(LO + 1, HI // 2),
                )
            except Exception as exc:  # first Mosaic run of ops/attention.py —
                # don't let a kernel-lowering failure sink the whole harness;
                # SSIP_ATTN_PALLAS=0 is the XLA-path escape hatch
                log(f"bf16_vit_b16 FAILED ({exc}); retrying with SSIP_ATTN_PALLAS=0")
                import os as _os

                _os.environ["SSIP_ATTN_PALLAS"] = "0"
                try:
                    embed_variant(
                        "bf16_vit_b16_xla_attn",
                        lambda v, x: vit.apply(v, x, train=False),
                        jax.device_put(vit_host),
                        jnp.bfloat16,
                        max(LO + 1, HI // 2),
                    )
                finally:
                    _os.environ.pop("SSIP_ATTN_PALLAS", None)

            # ViT-B/16 int8 PTQ (models/quantized_vit.py): every dense site on
            # the MXU's s8×s8→s32 mode; LN/GELU/attention full precision.
            try:
                from ssip_tpu.models.quantized_vit import (
                    make_quantized_vit_apply,
                    quantize_vit_extractor,
                )

                qvit = jax.device_put(
                    quantize_vit_extractor(vit_host, calib, arch="vit_b16")
                )
                qv_apply = make_quantized_vit_apply(arch="vit_b16")
                qv_apply_pre = make_quantized_vit_apply(
                    arch="vit_b16", stem_prequantized=True
                )

                def int8_step_vit(tree, u8):
                    if on_tpu:
                        xq = preprocess_images_pallas(
                            u8, quant_inv_scale=tree["stem"]["inv_in_scale"]
                        )
                        return qv_apply_pre(tree, xq)
                    return qv_apply(
                        tree, extraction_preprocess(u8, dtype=jnp.float32)
                    )

                embed_variant(
                    "int8_ptq_vit_b16", int8_step_vit, qvit, jnp.float32,
                    max(LO + 1, HI // 2), raw=True,
                )
            except Exception as exc:
                log(f"int8_ptq_vit_b16 FAILED ({exc}); skipping")

            # MoE ViT-S/16 bf16 (models/moe.py): Switch-style top-1 routing
            # with static-capacity one-hot dispatch — measures the single-chip
            # cost of the dispatch einsums + expert GEMMs (expert parallelism
            # itself needs a multi-chip mesh; see tests/test_moe.py).
            try:
                moe = MODEL_FACTORIES["vit_moe_s16"](
                    num_classes=None, compute_dtype=jnp.bfloat16
                )
                moe_host = seeded_init_host(moe, 42, (1, 224, 224, 3))
                embed_variant(
                    "bf16_vit_moe_s16",
                    lambda v, x: moe.apply(v, x, train=False),
                    jax.device_put(moe_host),
                    jnp.bfloat16,
                    max(LO + 1, HI // 2),
                )
            except Exception as exc:
                log(f"bf16_vit_moe_s16 FAILED ({exc}); skipping")

            # Dense ViT-S/16: the isolating comparator the MoE tower promises
            # (models/moe.py — identical non-expert shapes), so the MoE row
            # above can be read as "what the 8-expert layer costs per image".
            try:
                s16 = MODEL_FACTORIES["vit_s16"](
                    num_classes=None, compute_dtype=jnp.bfloat16
                )
                s16_host = seeded_init_host(s16, 42, (1, 224, 224, 3))
                embed_variant(
                    "bf16_vit_s16",
                    lambda v, x: s16.apply(v, x, train=False),
                    jax.device_put(s16_host),
                    jnp.bfloat16,
                    max(LO + 1, HI // 2),
                )
            except Exception as exc:
                log(f"bf16_vit_s16 FAILED ({exc}); skipping")

        # ViT train rows, dense vs MoE: the fused-epoch engine is
        # model-agnostic, and the MoE router's load-balance/z losses ride
        # the "aux" sow collection into the objective — this measures the
        # full MoE training objective, not just the forward. The rep loop
        # lives INSIDE one jitted program (fori_loop over the epoch scan,
        # embed-probe style): at ~50 ms/step the harness's python-loop
        # differencing drowns in this tunnel's 25-150 ms dispatch jitter
        # (first attempt measured a 374% spread).
        from functools import partial as _partial

        from ssip_tpu.train.engine import (
            TrainState as _TS,
            make_fused_epoch as _make_fused,
            make_optimizer as _make_opt,
        )

        vit_fused = _make_fused(augment=True)
        vtb = 128 if on_tpu else 16
        for arch in ("vit_s16", "vit_moe_s16"):
            try:
                vm = MODEL_FACTORIES[arch](
                    num_classes=2, compute_dtype=jnp.bfloat16
                )
                vm_host = seeded_init_host(vm, 0, (1, 224, 224, 3))
                vstate = _TS.create(
                    apply_fn=vm.apply, params=vm_host["params"],
                    batch_stats=vm_host.get("batch_stats", {}),
                    tx=_make_opt(1e-4, 1e-4),
                )
                vsteps = 8
                vimgs = jnp.asarray(rng.integers(
                    0, 256, (vsteps, vtb, 224, 224, 3), dtype=np.uint8
                ))
                vlabels = jnp.asarray(
                    rng.integers(0, 2, (vsteps, vtb)).astype(np.int32)
                )
                vvalid = jnp.ones((vsteps, vtb), bool)
                vkeys = jax.random.split(jax.random.key(0), vsteps)

                @_partial(jax.jit, static_argnames="reps")
                def vit_train_prog(s, imgs, labels, valid, keys, reps):
                    def body(_, carry):
                        s2, losses, _p = vit_fused(
                            carry, imgs, labels, valid, keys
                        )
                        return s2
                    out = jax.lax.fori_loop(0, reps, body, s)
                    # the result must depend on the trained PARAMS, not
                    # just the step counter — returning out.step alone
                    # lets XLA dead-code-eliminate the entire training
                    # computation (measured: 240k "steps/s")
                    return jax.tree_util.tree_reduce(
                        lambda a, leaf: a + jnp.sum(leaf.astype(jnp.float32)),
                        out.params, jnp.float32(0.0),
                    )

                def vit_train_loop(reps, _s=vstate, _i=vimgs, _l=vlabels,
                                   _v=vvalid, _k=vkeys):
                    return vit_train_prog(_s, _i, _l, _v, _k, reps=int(reps))

                record(
                    f"train_steps_per_sec_{arch}_bf16_batch{vtb}",
                    # ~50-100 ms/step: a 6-rep differenced window (~2-5 s)
                    # keeps the tunnel's 25-150 ms dispatch jitter under
                    # a few percent of the measurement
                    measure_rate(
                        vit_train_loop, 2, 8 if on_tpu else 3,
                        items_per_rep=vsteps, max_trials=8,
                    ),
                )
            except Exception as exc:
                log(f"train {arch} FAILED ({exc}); skipping")

    if args.only_vit or args.only_vit_train:
        # Merge the fresh ViT rows into the previous full run's table and
        # re-render. Every carried row is LISTED in ``carried_stale`` so
        # render_md can annotate it (advisor round-3: carried rows rendered
        # as freshly measured), and a superseded ViT variant (the Pallas
        # row when this run fell back to XLA attention, or vice versa) is
        # dropped rather than shown next to its replacement.
        notes = args.output_dir / "notes"
        prev = notes / "benchmarks.json"
        superseded = set()
        for a, b in (
            ("embedding_bf16_vit_b16_imgs_per_sec",
             "embedding_bf16_vit_b16_xla_attn_imgs_per_sec"),
        ):
            if a in results:
                superseded.update({b, b + "_spread"})
            elif b in results:
                superseded.update({a, a + "_spread"})
        carried = []
        if prev.exists():
            for k, v in json.loads(prev.read_text()).items():
                if k in results or k in superseded or k == "carried_stale":
                    continue
                results[k] = v
                # bools (e.g. a carried e2e_stale flag) are ints in Python —
                # exclude them so flags are never listed as stale metrics
                if (
                    not k.endswith("_spread")
                    and isinstance(v, (int, float))
                    and not isinstance(v, bool)
                ):
                    carried.append(k)
        results["carried_stale"] = sorted(carried)
        results["e2e_stale"] = any(k.startswith("e2e_") for k in carried)
        results.update(REFERENCE)
        results["platform"] = str(jax.devices()[0])
        notes.mkdir(parents=True, exist_ok=True)
        (notes / "benchmarks.json").write_text(
            json.dumps(results, indent=2, default=str)
        )
        render_md(results, notes, on_tpu)
        print(json.dumps({
            k: results[k] for k in sorted(results)
            if (k.startswith("embedding_") or k.startswith("train_steps_"))
            and "vit" in k and not k.endswith("_spread")
        }))
        return

    # 3. train step/sec (fused epochs): f32 reference-parity mode and the
    #    bf16 throughput mode (--compute-dtype bfloat16; params/BN/loss f32)
    from ssip_tpu.train.engine import TrainState, make_fused_epoch, make_optimizer

    host_cls_vars = seeded_init_host(ResNet18(num_classes=2), 0, (1, 224, 224, 3))
    fused = make_fused_epoch(augment=True)
    dtype_variants = (
        (("f32", jnp.float32), ("bf16", jnp.bfloat16))
        if not args.quick
        else (("f32", jnp.float32),)
    )
    for dname, dtype in dtype_variants:
        model = ResNet18(num_classes=2, compute_dtype=dtype)
        variables = jax.device_put(host_cls_vars)
        if args.quick:
            train_batches = (16,)
        elif on_tpu:
            train_batches = (16, 64, 128, 256)
        else:  # keep the CPU escape-hatch path runnable on one host core
            train_batches = (16, 64)
        for tb in train_batches:
            state = TrainState.create(
                apply_fn=model.apply, params=variables["params"],
                batch_stats=variables["batch_stats"], tx=make_optimizer(1e-4, 1e-4),
            )
            steps = 8
            imgs = jnp.asarray(
                rng.integers(0, 256, (steps, tb, 224, 224, 3), dtype=np.uint8)
            )
            labels = jnp.asarray(rng.integers(0, 2, (steps, tb)).astype(np.int32))
            valid = jnp.ones((steps, tb), bool)
            keys = jax.random.split(jax.random.key(0), steps)

            def train_loop(reps, _state=state, _imgs=imgs, _labels=labels,
                           _valid=valid, _keys=keys):
                s = _state
                out = jnp.float32(0.0)
                for _ in range(int(reps)):
                    s, losses, _ = fused(s, _imgs, _labels, _valid, _keys)
                    out = losses[-1]
                jax.block_until_ready(out)
                return out

            record(
                f"train_steps_per_sec_{dname}_batch{tb}",
                measure_rate(
                    train_loop, 1, 8 if on_tpu else 3, items_per_rep=steps,
                    max_trials=8,
                ),
            )

    # 3b. multi-seed fan-out (--num-seeds): 8 models' train steps in ONE
    #     vmapped program. The interesting number is lane-steps/s vs the
    #     solo batch-16 steps/s — how much of the 8× trial fan-out the chip
    #     absorbs for free when one tiny-batch step can't fill it.
    if on_tpu and not args.quick:
        from ssip_tpu.train.multi_seed import make_multi_epoch, stack_states

        n_lanes, tb, steps = 8, 16, 8
        ms_model = ResNet18(num_classes=2, compute_dtype=jnp.bfloat16)
        ms_state = TrainState.create(
            apply_fn=ms_model.apply, params=host_cls_vars["params"],
            batch_stats=host_cls_vars["batch_stats"],
            tx=make_optimizer(1e-4, 1e-4),
        )
        # identical init across lanes — throughput only; trajectories in
        # tests/test_multi_seed.py carry the correctness story
        stacked = jax.device_put(stack_states([ms_state] * n_lanes))
        imgs_full = jnp.asarray(
            rng.integers(0, 256, (128, 224, 224, 3), dtype=np.uint8)
        )
        labels_full = jnp.asarray(rng.integers(0, 2, (128,)).astype(np.int32))
        ms_pidx = jnp.asarray(rng.integers(0, 128, (n_lanes, steps, tb)))
        ms_valid = jnp.ones((steps, tb), bool)
        ms_keys = jnp.stack(
            [jax.random.split(jax.random.key(s), steps) for s in range(n_lanes)]
        )
        ms_epoch = make_multi_epoch(augment=True)

        def ms_loop(reps):
            s = stacked
            out = jnp.float32(0.0)
            for _ in range(int(reps)):
                s, losses, _ = ms_epoch(
                    s, imgs_full, labels_full, ms_pidx, ms_valid, ms_keys
                )
                out = losses[-1, -1]
            jax.block_until_ready(out)
            return out

        record(
            f"multiseed{n_lanes}_lane_steps_per_sec_bf16_batch{tb}",
            measure_rate(
                ms_loop, 1, 8, items_per_rep=steps * n_lanes, max_trials=8
            ),
        )

    # 4. host decode
    data_dir = CORPUS / "sans_label"
    if data_dir.exists():
        from ssip_tpu.data.decode import decode_batch

        files = sorted(data_dir.glob("*.jpg"))[:64]
        for label, use_native in (("native", True), ("pil", False)):
            t0 = time.perf_counter()
            decode_batch(files, use_native=use_native, num_threads=1)
            results[f"decode_{label}_imgs_per_sec"] = len(files) / (
                time.perf_counter() - t0
            )
            log(f"decode {label}: {results[f'decode_{label}_imgs_per_sec']:.0f} imgs/s")

    # 5. true cold end-to-end extraction
    if args.skip_e2e:
        # carry the previous run's e2e section forward (marked stale) so
        # the published table keeps all rows
        prev = args.output_dir / "notes" / "benchmarks.json"
        if prev.exists():
            old = json.loads(prev.read_text())
            for k, v in old.items():
                if k.startswith(("e2e_", "h2d_link")) and k not in results:
                    results[k] = v
            if any(k.startswith("e2e_") for k in results):
                results["e2e_stale"] = True
                log("e2e section carried from previous benchmarks.json (--skip-e2e)")
    elif not args.quick:
        e2e = measure_e2e_extraction(CORPUS, args.output_dir / "bench")
        if e2e:
            results.update(e2e)
            log(
                f"e2e cold: turbo {e2e['e2e_turbo_imgs_per_sec']:.0f}, "
                f"host-preproc {e2e['e2e_hostprep_imgs_per_sec']:.0f}, "
                f"streamed {e2e['e2e_streamed_imgs_per_sec']:.0f}, "
                f"sequential {e2e['e2e_sequential_imgs_per_sec']:.0f}, "
                f"decode-only {e2e['e2e_decode_only_imgs_per_sec']:.0f} imgs/s, "
                f"h2d link {e2e['h2d_link_mb_per_sec']:.0f} MB/s"
            )

    results.update(REFERENCE)
    results["platform"] = str(jax.devices()[0])

    notes = args.output_dir / "notes"
    notes.mkdir(parents=True, exist_ok=True)
    (notes / "benchmarks.json").write_text(json.dumps(results, indent=2, default=str))
    render_md(results, notes, on_tpu)
    print(json.dumps(
        {"embedding_bf16_imgs_per_sec": results["embedding_bf16_imgs_per_sec"]}
    ))


def render_md(results: dict, notes: Path, on_tpu: bool) -> None:
    """Render ``benchmarks.md`` from a (possibly reloaded) results dict."""
    carried = set(results.get("carried_stale", []))

    def fmt(key: str) -> str:
        v = float(results.get(key, 0.0))
        s = results.get(key + "_spread")
        base = f"{v:.1f}" if v < 100 else f"{v:.0f}"
        spread = f" (±{float(s) * 50:.0f}%)" if s is not None else ""
        # rows merged forward by --only-vit are measurements from a
        # PREVIOUS run — never render them as fresh. e2e_* rows get the
        # fuller e2e_stale suffix from e2e_row instead (advisor round-4:
        # don't double-annotate).
        stale = (
            " (stale: carried)"
            if key in carried and not key.startswith("e2e_")
            else ""
        )
        return base + spread + stale

    emb = float(results.get("embedding_bf16_imgs_per_sec", 0.0))
    lines = [
        "# Benchmarks",
        "",
        f"Platform: {results['platform']}",
        "",
        "| Metric | Value | Reference/Target |",
        "|---|---|---|",
        f"| Fused preprocess | {fmt('preprocess_imgs_per_sec')} imgs/s | — |",
        f"| Embedding (bf16, shipped plain forward) | {fmt('embedding_bf16_imgs_per_sec')} imgs/s/chip | 359 imgs/s (ref GPU e2e); ≥5000 target |",
    ]
    if "embedding_bf16_folded_s2d_imgs_per_sec" in results:
        lines.append(
            f"| Embedding (bf16, manual folded-BN + s2d variant) | "
            f"{fmt('embedding_bf16_folded_s2d_imgs_per_sec')} imgs/s/chip | — |"
        )
    if "embedding_f32_imgs_per_sec" in results:
        lines.append(
            f"| Embedding (f32 parity mode, on-chip) | "
            f"{fmt('embedding_f32_imgs_per_sec')} imgs/s/chip | — |"
        )
    if "embedding_int8_ptq_imgs_per_sec" in results:
        lines.append(
            f"| Embedding (int8 PTQ, max-throughput approximate mode) | "
            f"{fmt('embedding_int8_ptq_imgs_per_sec')} imgs/s/chip | — |"
        )
    if "embedding_bf16_r50_imgs_per_sec" in results:
        lines.append(
            f"| Embedding ResNet-50 (bf16) | "
            f"{fmt('embedding_bf16_r50_imgs_per_sec')} imgs/s/chip | — |"
        )
    if "embedding_int8_ptq_r50_imgs_per_sec" in results:
        lines.append(
            f"| Embedding ResNet-50 (int8 PTQ) | "
            f"{fmt('embedding_int8_ptq_r50_imgs_per_sec')} imgs/s/chip | — |"
        )
    for key, label in (
        ("embedding_bf16_vit_b16_imgs_per_sec",
         "Embedding ViT-B/16 (bf16, fused Pallas attention)"),
        ("embedding_bf16_vit_b16_xla_attn_imgs_per_sec",
         "Embedding ViT-B/16 (bf16, XLA-attention fallback)"),
        ("embedding_int8_ptq_vit_b16_imgs_per_sec",
         "Embedding ViT-B/16 (int8 PTQ)"),
        ("embedding_bf16_vit_s16_imgs_per_sec",
         "Embedding ViT-S/16 (bf16, dense — MoE comparator)"),
        ("embedding_bf16_vit_moe_s16_imgs_per_sec",
         "Embedding MoE ViT-S/16 (bf16, 8 experts, Switch top-1)"),
    ):
        if key in results:
            lines.append(f"| {label} | {fmt(key)} imgs/s/chip | — |")
    if "e2e_streamed_imgs_per_sec" in results:
        # --skip-e2e carries the previous run's e2e section forward; mark
        # those rows so the table never pairs fresh on-chip numbers with
        # old tunnel weather without saying so.
        e2e_carried = results.get("e2e_stale") or any(
            k.startswith("e2e_") for k in carried
        )
        stale_s = (
            " (stale: carried from a previous run)" if e2e_carried else ""
        )

        def e2e_row(label: str, key: str, target: str = "—") -> str:
            link = results.get(f"e2e_{key}_link_mb_per_sec")
            link_s = f" @ link {float(link):.0f} MB/s" if link is not None else ""
            return (
                f"| E2E cold extraction ({label}) | "
                f"{fmt(f'e2e_{key}_imgs_per_sec')} imgs/s{link_s}{stale_s} "
                f"| {target} |"
            )

        lines += [
            e2e_row(
                "turbo: stream + fast-decode + host crop", "turbo",
                "359 imgs/s (ref GPU e2e)",
            ),
            e2e_row("host-preproc: exact resize+crop on host", "hostprep"),
            e2e_row("streamed, overlapped, exact numerics", "streamed"),
            e2e_row("sequential", "sequential"),
            f"| Host decode (corpus, 1-core box) | "
            f"{results['e2e_decode_only_imgs_per_sec']:.0f} imgs/s | — |",
            f"| Host→device link (median over the 4 shape windows) | "
            f"{results['h2d_link_mb_per_sec']:.0f} MB/s | — |",
        ]
    for dname, label in (("f32", "f32 parity"), ("bf16", "bf16 throughput")):
        for tb in (16, 64, 128, 256, 512):
            key = f"train_steps_per_sec_{dname}_batch{tb}"
            if key in results:
                imgs_s = float(results[key]) * tb
                # fwd ≈1.82 GFLOP/img (docs/performance.md) + backward ≈2×
                # forward ⇒ ~5.46 GFLOP/img; v5e bf16 peak 197 TFLOP/s.
                # f32 has no native MXU peak (it runs as multi-pass bf16),
                # so f32 rows are stated against the bf16 peak explicitly
                # rather than as "MFU" of a nonexistent f32 peak.
                pct = imgs_s * 5.46e9 / 197e12 * 100.0
                unit = "% MFU" if dname == "bf16" else "% of bf16 peak"
                lines.append(
                    f"| Train step/sec ({label}, batch {tb}) | {fmt(key)} "
                    f"steps/s = {imgs_s:.0f} imgs/s"
                    + (f" ≈ {pct:.0f}{unit}" if on_tpu else "")
                    + " | ref GPU: baseline 2.49 s total |"
                )
    for arch, label in (
        ("vit_s16", "Train ViT-S/16 (bf16, dense — MoE comparator)"),
        ("vit_moe_s16", "Train MoE ViT-S/16 (bf16, 8 experts, incl. aux losses)"),
    ):
        for tb in (16, 128):
            key = f"train_steps_per_sec_{arch}_bf16_batch{tb}"
            if key in results:
                imgs_s = float(results[key]) * tb
                lines.append(
                    f"| {label}, batch {tb} | {fmt(key)} steps/s = "
                    f"{imgs_s:.0f} imgs/s | — |"
                )
    ms_key = "multiseed8_lane_steps_per_sec_bf16_batch16"
    if ms_key in results:
        lane_rate = float(results[ms_key])
        solo_key = "train_steps_per_sec_bf16_batch16"
        gain = (
            f" = {lane_rate / float(results[solo_key]):.1f}× the solo "
            f"batch-16 steps/s (ideal 8×)"
            if solo_key in results
            else ""
        )
        lines.append(
            f"| Train, 8-seed fan-out (bf16, batch 16/lane) | {fmt(ms_key)} "
            f"lane-steps/s{gain} | — |"
        )
    for label in ("native", "pil"):
        key = f"decode_{label}_imgs_per_sec"
        if key in results:
            stale = " (stale: carried)" if key in carried else ""
            lines.append(
                f"| Host decode ({label}, 64 imgs) | "
                f"{results[key]:.0f} imgs/s/core{stale} | — |"
            )
    lines.append("")
    lines.append(
        f"On-chip embedding vs reference end-to-end: **{emb / 359.0:.1f}×**; "
        f"vs 5k/chip target: **{emb / 5000.0:.1f}×**."
    )
    if "e2e_streamed_imgs_per_sec" in results:
        from benchmarks.common import e2e_bottleneck

        e2e_rate = float(results["e2e_turbo_imgs_per_sec"])
        lines.append(
            f"True cold e2e (disk→decode→H2D→embed, turbo shape): "
            f"**{e2e_rate / 359.0:.1f}×** the reference's 359 imgs/s. Measured "
            f"bottleneck: {e2e_bottleneck(results)}. Overlap gains "
            f"×{results.get('e2e_overlap_speedup', 1.0):.2f} over the sequential "
            f"shape; warm-cache runs bypass decode entirely (memmap store)."
        )
    (notes / "benchmarks.md").write_text("\n".join(lines) + "\n")


if __name__ == "__main__":
    if "--render-only" in sys.argv:
        # Re-render benchmarks.md from the saved benchmarks.json without
        # touching the device (fast path after a renderer-only change).
        notes = REPO / "outputs" / "notes"
        saved = json.loads((notes / "benchmarks.json").read_text())
        render_md(saved, notes, on_tpu="TPU" in str(saved.get("platform", "")))
    else:
        main()

"""Profile the flagship embed path and summarize where the cycles go.

Round-2 verdict item 8: the ~40% MFU headline was a differenced-timer claim
with no trace behind it. This script traces the exact program bench.py
measures (fused Pallas preproc + frozen ResNet-18 bf16 forward, batch 128)
with ``jax.profiler``, parses the emitted perfetto trace, and writes an
op-level time breakdown to ``outputs/notes/profile_embed.md`` — the numbers
docs/performance.md cites. The raw trace directory is left under
``outputs/profile/`` for TensorBoard.

Usage: ``python benchmarks/profile_embed.py [--batch 128] [--passes 8]``
"""

from __future__ import annotations

import argparse
import gzip
import json
import sys
from collections import defaultdict
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def parse_perfetto(trace_gz: Path) -> tuple[dict, dict, dict, float]:
    """(time-by-op-name, bytes-by-op-name, time-by-hlo-category, total-us).

    Counts only the device's "XLA Ops" thread — the leaf HLO executions.
    The "XLA Modules" / "TC Overlay" threads are containers (whole-program
    and while-loop spans) that would double-count every child. Buckets come
    from the profiler's own ``hlo_category`` annotation; ``bytes_accessed``
    is aggregated so memory-boundedness (GB/s) can be derived per op.
    """
    with gzip.open(trace_gz, "rt") as f:
        payload = json.load(f)
    events = payload.get("traceEvents", [])
    device_pids: set = set()
    op_tids: set = set()
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pname = str(ev.get("args", {}).get("name", ""))
            if "TPU" in pname:
                device_pids.add(ev.get("pid"))
        elif ev.get("name") == "thread_name":
            if str(ev.get("args", {}).get("name", "")) == "XLA Ops":
                op_tids.add((ev.get("pid"), ev.get("tid")))
    if device_pids:
        op_tids = {pt for pt in op_tids if pt[0] in device_pids}
    if not op_tids:
        # Without the leaf-op thread filter we would count "XLA Modules" /
        # overlay container spans that wrap the same ops, ~doubling device
        # time — refuse rather than silently publish halved imgs/s.
        raise SystemExit(
            f"no 'XLA Ops' thread metadata in {trace_gz} — profiler trace "
            "format changed? refusing to double-count container spans"
        )
    by_name: dict[str, float] = defaultdict(float)
    bytes_by_name: dict[str, float] = defaultdict(float)
    by_cat: dict[str, float] = defaultdict(float)
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid")) not in op_tids:
            continue
        args = ev.get("args", {})
        cat = str(args.get("hlo_category", "uncategorized"))
        # while/conditional spans are CONTAINERS wrapping their body ops on
        # the same thread (the scan + fori_loop each cover the full window)
        # — counting them would double every leaf.
        if cat in ("while", "conditional"):
            continue
        dur = float(ev.get("dur", 0.0))
        name = str(ev.get("name", "?"))
        by_name[name] += dur
        bytes_by_name[name] += float(args.get("bytes_accessed", 0) or 0)
        by_cat[cat] += dur
        total += dur
    return dict(by_name), dict(bytes_by_name), dict(by_cat), total


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--n-batches", type=int, default=8)
    parser.add_argument("--passes", type=int, default=8)
    parser.add_argument(
        "--int8", action="store_true",
        help="profile the int8 PTQ path (fused quantizing preproc + "
        "quantized forward) instead of the bf16 default",
    )
    parser.add_argument(
        "--arch", default="resnet18",
        help="backbone to profile (resnet18 default; any MODEL_FACTORIES "
        "key, e.g. vit_b16 — bf16 only, --int8 stays ResNet)",
    )
    parser.add_argument(
        "--parse-only", action="store_true",
        help="skip tracing; re-summarize the latest trace on disk",
    )
    parser.add_argument("--output-dir", type=Path, default=REPO / "outputs")
    args = parser.parse_args()
    if args.int8 and not (
        args.arch == "resnet18" or args.arch.startswith("vit_")
    ):
        raise SystemExit("--int8 profiles the ResNet-18 or ViT PTQ paths")
    tag = (
        ("embed_int8" if args.arch == "resnet18"
         else f"embed_int8_{args.arch}")
        if args.int8
        else ("embed_bf16" if args.arch == "resnet18"
              else f"embed_bf16_{args.arch}")
    )

    if args.parse_only:
        profile_dir = args.output_dir / "profile" / tag
        # The image count must come from the run that PRODUCED the trace,
        # not from this invocation's flags (a default-flag --parse-only of
        # a --batch 64 trace would otherwise inflate imgs/s 2×).
        meta_path = profile_dir / "meta.json"
        if meta_path.exists():
            meta = json.loads(meta_path.read_text())
            imgs = int(meta["imgs"])
            args.batch = int(meta.get("batch", args.batch))
        else:
            print(
                "warning: no meta.json next to the trace; deriving the "
                "image count from CLI flags — they MUST match the traced "
                "run", file=sys.stderr,
            )
            imgs = args.passes * args.n_batches * args.batch
        summarize(args, profile_dir, imgs, float("nan"))
        return

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
    batches = jnp.asarray(
        rng.integers(
            0, 256, (args.n_batches, args.batch, 512, 512, 3), dtype=np.uint8
        )
    )
    jax.block_until_ready(batches)

    if args.arch == "resnet18":
        model = ResNet18(num_classes=None, compute_dtype=jnp.bfloat16)
    else:
        from ssip_tpu.models import MODEL_FACTORIES

        model = MODEL_FACTORIES[args.arch](
            num_classes=None, compute_dtype=jnp.bfloat16
        )
    host_variables = seeded_init_host(model, 42, (1, 224, 224, 3))
    variables = jax.device_put(host_variables)

    if args.int8 and args.arch.startswith("vit_"):
        from ssip_tpu.models.quantized_vit import (
            make_quantized_vit_apply,
            quantize_vit_extractor,
        )

        calib = (
            preprocess_images_pallas(batches[0], out_dtype=jnp.float32)
            if on_tpu
            else extraction_preprocess(batches[0], dtype=jnp.float32)
        )
        variables = jax.device_put(
            quantize_vit_extractor(host_variables, calib, arch=args.arch)
        )
        qv_pre = make_quantized_vit_apply(arch=args.arch, stem_prequantized=True)
        qv = make_quantized_vit_apply(arch=args.arch)

        def full_step(tree, u8):
            if on_tpu:
                xq = preprocess_images_pallas(
                    u8, quant_inv_scale=tree["stem"]["inv_in_scale"]
                )
                return qv_pre(tree, xq)
            return qv(tree, extraction_preprocess(u8, dtype=jnp.float32))
    elif args.int8:
        from ssip_tpu.models.quantized import (
            make_quantized_apply,
            quantize_extractor,
        )

        calib = (
            preprocess_images_pallas(batches[0], out_dtype=jnp.float32)
            if on_tpu
            else extraction_preprocess(batches[0], dtype=jnp.float32)
        )
        variables = jax.device_put(quantize_extractor(host_variables, calib))
        q_apply_pre = make_quantized_apply(stem_prequantized=True)
        q_apply = make_quantized_apply()

        def full_step(tree, u8):
            if on_tpu:
                xq = preprocess_images_pallas(
                    u8, quant_inv_scale=tree["stem"]["inv_in_scale"]
                )
                return q_apply_pre(tree, xq)
            return q_apply(
                tree, extraction_preprocess(u8, dtype=jnp.float32)
            )
    else:
        def full_step(tree, u8):
            x = (
                preprocess_images_pallas(u8, out_dtype=jnp.bfloat16)
                if on_tpu
                else extraction_preprocess(u8, dtype=jnp.bfloat16)
            )
            return model.apply(tree, x, train=False)

    @partial(jax.jit, static_argnames="reps")
    def embed_all(batches, variables, reps):
        def one_pass(_, acc):
            def step(c, u8):
                return c + jnp.sum(full_step(variables, u8)), None
            c, _ = jax.lax.scan(step, acc, batches)
            return c
        return jax.lax.fori_loop(0, reps, one_pass, jnp.float32(0.0))

    # warm: compile + session init, outside the trace
    float(embed_all(batches, variables, 2))

    import time

    profile_dir = args.output_dir / "profile" / tag
    profile_dir.mkdir(parents=True, exist_ok=True)
    # Host python-call events can flood the trace's ~1M event cap on long
    # windows (a 60 s ViT window produced 1,000,000 python events and ZERO
    # device events) — the device timeline is all we parse, so turn the
    # python tracer off.
    opts = jax.profiler.ProfileOptions()
    opts.python_tracer_level = 0
    opts.host_tracer_level = 1
    t0 = time.perf_counter()
    with jax.profiler.trace(
        str(profile_dir), create_perfetto_trace=True, profiler_options=opts
    ):
        float(embed_all(batches, variables, args.passes))
    wall = time.perf_counter() - t0
    imgs = args.passes * args.n_batches * args.batch
    (profile_dir / "meta.json").write_text(json.dumps(
        {"imgs": imgs, "batch": args.batch, "n_batches": args.n_batches,
         "passes": args.passes}
    ))
    print(f"traced window: {imgs} imgs in {wall:.2f}s = {imgs / wall:.0f} imgs/s")
    summarize(args, profile_dir, imgs, wall)


def summarize(args, profile_dir: Path, imgs: int, wall: float) -> None:
    traces = sorted(profile_dir.rglob("*.json.gz"))
    if not traces:
        print("no perfetto trace emitted", file=sys.stderr)
        raise SystemExit(1)
    by_name, bytes_by_name, by_cat, total = parse_perfetto(traces[-1])
    if total <= 0:
        print("empty trace", file=sys.stderr)
        raise SystemExit(1)

    device_imgs_per_sec = imgs / (total / 1e6)
    lines = [
        "# Embed-path profile (%s %s, batch %d)"
        % (getattr(args, "arch", "resnet18"),
           "int8 PTQ" if getattr(args, "int8", False) else "bf16", args.batch),
        "",
        f"Traced `{traces[-1].relative_to(args.output_dir)}` — "
        f"{imgs} images; device busy time {total / 1e3:.0f} ms "
        f"⇒ {device_imgs_per_sec:.0f} imgs/s of pure device time"
        + (
            f" (wall {wall:.2f}s includes trace streaming overhead)."
            if wall == wall
            else " (re-summarized from the trace on disk)."
        )
        + " Only the leaf 'XLA Ops' thread is counted; categories are the "
        "profiler's own hlo_category annotations.",
        "",
        "## Device time by HLO category",
        "",
        "| Category | device time (ms) | share |",
        "|---|---|---|",
    ]
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        lines.append(
            f"| {cat} | {dur / 1e3:.1f} | {dur / total * 100.0:.1f}% |"
        )
    lines += ["", "## Top 20 ops by device time", ""]
    lines += [
        "| Op | ms | share | HBM GB/s |",
        "|---|---|---|---|",
    ]
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:20]:
        short = name if len(name) <= 70 else name[:67] + "..."
        gbps = bytes_by_name.get(name, 0.0) / max(dur, 1e-9) / 1e3
        lines.append(
            f"| `{short}` | {dur / 1e3:.1f} | {dur / total * 100.0:.1f}% "
            f"| {gbps:.0f} |"
        )
    lines.append("")
    arch = getattr(args, "arch", "resnet18")
    out_md = args.output_dir / "notes" / (
        ("profile_embed_int8.md" if arch == "resnet18"
         else f"profile_embed_int8_{arch}.md")
        if getattr(args, "int8", False)
        else ("profile_embed.md" if arch == "resnet18"
              else f"profile_embed_{arch}.md")
    )
    out_md.parent.mkdir(parents=True, exist_ok=True)
    out_md.write_text("\n".join(lines))
    print(f"wrote {out_md}")
    print(f"device busy: {total / 1e3:.0f} ms = {device_imgs_per_sec:.0f} imgs/s")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<40} {dur / 1e3:>10.1f} ms  {dur / total * 100.0:5.1f}%")


if __name__ == "__main__":
    main()

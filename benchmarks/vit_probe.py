"""Focused v5e probe for the round-4 ViT rework (fused LN + packed-qkv attn).

Measures ViT-B/16 bf16 embed throughput (same window/batch parameters as
the full harness) plus optional int8/MoE/dense-S16 rows, each in its own
invocation-controlled section so a single wedged compile can't sink the
rest. One process — compiles serialize across processes on this box.

Usage: python benchmarks/vit_probe.py [b16] [b16_int8] [moe_s16] [s16] [t16]
"""

from __future__ import annotations

import json
import sys
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from benchmarks.common import log, measure_rate


def main() -> None:
    sections = set(sys.argv[1:]) or {"b16"}
    from ssip_tpu.runtime.jaxconfig import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ssip_tpu.models import MODEL_FACTORIES
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.ops.pallas_preproc import preprocess_images_pallas
    from ssip_tpu.ops.resize import extraction_preprocess

    on_tpu = jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    B, NB = (128, 8) if on_tpu else (16, 2)
    LO, HI = (2, 25) if on_tpu else (1, 3)
    batches = jnp.asarray(
        rng.integers(0, 256, (NB, B, 512, 512, 3), dtype=np.uint8)
    )
    jax.block_until_ready(batches)
    results = {}

    def embed_variant(name, apply_fn, tree, dtype, raw=False):
        @partial(jax.jit, static_argnames="reps")
        def loop(batches, tree, reps):
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

        res = measure_rate(
            lambda r: loop(batches, tree, r), LO, HI, items_per_rep=NB * B
        )
        results[name] = res.median
        log(f"{name}: {res}")

    def vit_host(arch):
        m = MODEL_FACTORIES[arch](num_classes=None, compute_dtype=jnp.bfloat16)
        return m, seeded_init_host(m, 42, (1, 224, 224, 3))

    if "b16" in sections:
        vit, host = vit_host("vit_b16")
        embed_variant(
            "embedding_bf16_vit_b16_imgs_per_sec",
            lambda v, x: vit.apply(v, x, train=False),
            jax.device_put(host), jnp.bfloat16,
        )
    if "s16" in sections:
        vit, host = vit_host("vit_s16")
        embed_variant(
            "embedding_bf16_vit_s16_imgs_per_sec",
            lambda v, x: vit.apply(v, x, train=False),
            jax.device_put(host), jnp.bfloat16,
        )
    if "t16" in sections:
        vit, host = vit_host("vit_t16")
        embed_variant(
            "embedding_bf16_vit_t16_imgs_per_sec",
            lambda v, x: vit.apply(v, x, train=False),
            jax.device_put(host), jnp.bfloat16,
        )
    if "moe_s16" in sections:
        moe, host = vit_host("vit_moe_s16")
        embed_variant(
            "embedding_bf16_vit_moe_s16_imgs_per_sec",
            lambda v, x: moe.apply(v, x, train=False),
            jax.device_put(host), jnp.bfloat16,
        )
    if "b16_int8" in sections:
        from ssip_tpu.models.quantized_vit import (
            make_quantized_vit_apply,
            quantize_vit_extractor,
        )

        _, host = vit_host("vit_b16")
        calib = (
            preprocess_images_pallas(batches[0], out_dtype=jnp.float32)
            if on_tpu
            else extraction_preprocess(batches[0], dtype=jnp.float32)
        )
        qvit = jax.device_put(quantize_vit_extractor(host, calib, arch="vit_b16"))
        qv_pre = make_quantized_vit_apply(arch="vit_b16", stem_prequantized=True)
        qv = make_quantized_vit_apply(arch="vit_b16")

        def int8_step(tree, u8):
            if on_tpu:
                xq = preprocess_images_pallas(
                    u8, quant_inv_scale=tree["stem"]["inv_in_scale"]
                )
                return qv_pre(tree, xq)
            return qv(tree, extraction_preprocess(u8, dtype=jnp.float32))

        embed_variant(
            "embedding_int8_ptq_vit_b16_imgs_per_sec",
            int8_step, qvit, jnp.float32, raw=True,
        )

    print(json.dumps(results))


if __name__ == "__main__":
    main()

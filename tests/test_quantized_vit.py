"""int8 PTQ for the ViT extractor: noise envelope + plumbing.

Mirrors tests/test_quantized.py's accuracy-envelope style for the ViT path
(models/quantized_vit.py). The reference has no ViT and no quantization;
this backs `--compute-dtype int8 --arch vit_*` (TPU-extra throughput mode).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssip_tpu.models import MODEL_FACTORIES
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.quantized_vit import (
    make_quantized_vit_apply,
    quantize_vit_extractor,
)
from ssip_tpu.models.vit import VIT_CONFIGS

ARCH = "vit_t16"
IMG = 32


def _cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = a / np.linalg.norm(a, axis=1, keepdims=True)
    b = b / np.linalg.norm(b, axis=1, keepdims=True)
    return np.sum(a * b, axis=1)


@pytest.fixture(scope="module")
def vit_setup():
    model = MODEL_FACTORIES[ARCH](num_classes=None)
    variables = seeded_init_host(model, 42, (1, IMG, IMG, 3))
    rng = np.random.default_rng(0)
    # ImageNet-normalized-looking activations
    x = jnp.asarray(rng.normal(0.0, 1.0, (4, IMG, IMG, 3)), jnp.float32)
    qtree = quantize_vit_extractor(variables, x, arch=ARCH)
    ref = np.asarray(model.apply(variables, x, train=False))
    return model, variables, x, qtree, ref


def test_quantized_vit_close_to_f32(vit_setup):
    _, _, x, qtree, ref = vit_setup
    q_apply = make_quantized_vit_apply(arch=ARCH)
    got = np.asarray(jax.jit(q_apply)(qtree, x))
    assert got.shape == ref.shape == (4, VIT_CONFIGS[ARCH]["hidden_dim"])
    cos = _cosine(ref, got)
    assert np.all(cos > 0.99), cos
    assert np.linalg.norm(ref - got) / np.linalg.norm(ref) < 0.1


def test_quantized_vit_tree_structure(vit_setup):
    _, _, _, qtree, _ = vit_setup
    cfg = VIT_CONFIGS[ARCH]
    assert qtree["stem"]["kernel"].dtype == jnp.int8
    assert qtree["stem"]["kernel"].shape == (16, 16, 3, cfg["hidden_dim"])
    assert len(qtree["blocks"]) == cfg["num_layers"]
    blk = qtree["blocks"][0]
    assert blk["qkv"]["kernel"].dtype == jnp.int8
    assert blk["qkv"]["kernel"].shape == (
        cfg["hidden_dim"], 3 * cfg["hidden_dim"]
    )
    assert blk["mlp_2"]["mult"].shape == (cfg["hidden_dim"],)
    for m in ("qkv", "out", "mlp_1", "mlp_2"):
        k = np.asarray(blk[m]["kernel"])
        assert k.min() >= -127 and k.max() <= 127
        assert float(blk[m]["inv_in_scale"]) > 0


def test_quantized_vit_deterministic(vit_setup):
    _, _, x, qtree, _ = vit_setup
    q_apply = make_quantized_vit_apply(arch=ARCH)
    a = np.asarray(q_apply(qtree, x))
    b = np.asarray(q_apply(qtree, x))
    np.testing.assert_array_equal(a, b)


def test_stem_prequantized_matches_outside_quant(vit_setup):
    _, _, x, qtree, _ = vit_setup
    from ssip_tpu.models.quantized_vit import _quant

    pre = make_quantized_vit_apply(arch=ARCH, stem_prequantized=True)
    post = make_quantized_vit_apply(arch=ARCH)
    x_q = _quant(x, qtree["stem"]["inv_in_scale"])
    np.testing.assert_array_equal(
        np.asarray(pre(qtree, x_q)), np.asarray(post(qtree, x))
    )


def test_int8_vit_extraction_end_to_end(tiny_image_tree, tmp_path):
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    def run(dtype):
        return run_extraction(
            ExtractionConfig(
                data_dir=tiny_image_tree, output_dir=tmp_path / dtype,
                batch_size=8, device="cpu", compute_dtype=dtype, arch=ARCH,
                crop=32, resize=36, cache_decoded=False,
            )
        )

    f32 = run("float32")
    q = run("int8")
    assert q.weights_source.endswith("+int8_ptq")
    assert q.embeddings.shape == f32.embeddings.shape
    cos = _cosine(f32.embeddings, q.embeddings)
    assert np.all(cos > 0.98), cos.min()


def test_fused_qmlp_interpret_matches_unfused(vit_setup):
    """The Pallas int8 MLP (ops/qmlp.py) must reproduce the unfused site
    composition near-exactly: integer GEMM accumulation is exact, the
    quantize/dequant/GELU elementwise ops are the same f32 code."""
    from ssip_tpu.ops.qmlp import quantized_mlp, quantized_mlp_xla

    _, _, _, qtree, _ = vit_setup
    blk = qtree["blocks"][0]
    d = blk["mlp_1"]["kernel"].shape[0]
    rng = np.random.default_rng(23)
    # 300 rows: exercises the ragged final row block (300 = 256 + 44)
    y = jnp.asarray(rng.normal(size=(300, d)).astype(np.float32))

    fused = quantized_mlp(y, blk, interpret=True)
    ref = quantized_mlp_xla(y, blk)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=1e-5, rtol=1e-5
    )

    # bf16 stream input (the int8 path's inter_dtype) must also agree
    fused_bf = quantized_mlp(y.astype(jnp.bfloat16), blk, interpret=True)
    ref_bf = quantized_mlp_xla(y.astype(jnp.bfloat16), blk)
    np.testing.assert_allclose(
        np.asarray(fused_bf), np.asarray(ref_bf), atol=1e-5, rtol=1e-5
    )

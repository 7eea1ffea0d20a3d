"""int8 post-training quantization of the frozen extractor.

The quantized path is a throughput mode, not a parity mode — these tests
pin its accuracy envelope (vs the f32 oracle forward) and its determinism,
on CPU via XLA's s8×s8→s32 conv lowering (the TPU kernel is the same HLO).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssip_tpu.models import ResNet18, ResNet50
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.quantized import (
    calibrate_act_scales,
    fold_f32_extractor,
    make_quantized_apply,
    quantize_extractor,
)
from ssip_tpu.models.resnet import MODEL_STAGES


def _cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.sum(a * b, -1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )


@pytest.fixture(scope="module")
def r18_setup():
    model = ResNet18(num_classes=None)
    variables = seeded_init_host(model, 42, (1, 64, 64, 3))
    rng = np.random.default_rng(0)
    # ImageNet-normalized-like dynamic range
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32) * 1.5
    return model, variables, x


def test_quantized_embeddings_close_to_f32(r18_setup):
    model, variables, x = r18_setup
    ref = np.asarray(model.apply(variables, x, train=False))
    qtree = quantize_extractor(variables, x)
    got = np.asarray(jax.jit(make_quantized_apply())(qtree, x))
    assert got.shape == ref.shape == (4, 512)
    cos = _cosine(ref, got)
    assert np.all(cos > 0.999), cos
    assert np.linalg.norm(ref - got) / np.linalg.norm(ref) < 0.05


def test_quantized_deterministic(r18_setup):
    _, variables, x = r18_setup
    t1 = quantize_extractor(variables, x)
    t2 = quantize_extractor(variables, x)
    apply = jax.jit(make_quantized_apply())
    np.testing.assert_array_equal(
        np.asarray(apply(t1, x)), np.asarray(apply(t2, x))
    )


def test_quantized_tree_structure(r18_setup):
    _, variables, x = r18_setup
    qtree = quantize_extractor(variables, x)
    stem = qtree["stem"]
    assert stem["kernel"].dtype == jnp.int8
    assert stem["kernel"].shape == (7, 7, 3, 64)
    assert stem["mult"].shape == (64,)
    assert float(stem["inv_in_scale"]) > 0
    assert len(qtree["blocks"]) == 8  # resnet18: 2+2+2+2
    # stage-transition blocks carry a downsample site
    assert "downsample" in qtree["blocks"][2]
    assert "downsample" not in qtree["blocks"][1]
    # int8 range respected
    for site in (stem, qtree["blocks"][0]["conv1"]):
        k = np.asarray(site["kernel"])
        assert k.min() >= -127 and k.max() <= 127


def test_downsample_shares_conv1_input_scale(r18_setup):
    _, variables, x = r18_setup
    folded = fold_f32_extractor(variables)
    scales = calibrate_act_scales(folded, x)
    for s in scales["blocks"]:
        if "downsample" in s:
            assert s["downsample"] == s["conv1"]


def test_quantized_bottleneck_resnet50():
    model = ResNet50(num_classes=None)
    variables = seeded_init_host(model, 7, (1, 64, 64, 3))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False))
    qtree = quantize_extractor(
        variables, x, stage_sizes=MODEL_STAGES["resnet50"], bottleneck=True
    )
    got = np.asarray(
        jax.jit(
            make_quantized_apply(
                stage_sizes=MODEL_STAGES["resnet50"], bottleneck=True
            )
        )(qtree, x)
    )
    assert got.shape == ref.shape == (2, 2048)
    assert np.all(_cosine(ref, got) > 0.995)


def test_int8_extraction_end_to_end(tiny_image_tree, tmp_path):
    """--compute-dtype int8 through the real extraction pipeline: runs,
    records the PTQ weights source, and stays close to the f32 run."""
    from ssip_tpu.pipelines.extraction import ExtractionConfig, run_extraction

    cfg = dict(
        data_dir=tiny_image_tree, device="cpu", batch_size=8,
        cache_decoded=False, resize=72, crop=64,
    )
    f32 = run_extraction(
        ExtractionConfig(output_dir=tmp_path / "f32", **cfg)
    )
    q = run_extraction(
        ExtractionConfig(
            output_dir=tmp_path / "q", compute_dtype="int8", **cfg
        )
    )
    assert q.weights_source.endswith("+int8_ptq")
    assert q.embeddings.shape == f32.embeddings.shape
    cos = _cosine(f32.embeddings, q.embeddings)
    assert np.all(cos > 0.99), cos.min()


def test_fused_quant_preproc_kernel_matches_xla(tmp_path):
    """Pallas preproc + fused int8 quantization epilogue (interpret mode)
    == quantizing the XLA preprocess output — bit-identical int8."""
    from ssip_tpu.models.quantized import _quant
    from ssip_tpu.ops.pallas_preproc import preprocess_images_pallas
    from ssip_tpu.ops.resize import extraction_preprocess

    rng = np.random.default_rng(5)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8))
    inv_s = jnp.float32(127.0 / 2.7)
    want = _quant(
        extraction_preprocess(u8, resize=40, crop=32, dtype=jnp.float32),
        inv_s,
    )
    got = preprocess_images_pallas(
        u8, resize=40, crop=32, quant_inv_scale=inv_s, interpret=True
    )
    assert got.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

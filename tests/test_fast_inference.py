"""Folded-BN / space-to-depth fast inference ≡ the standard frozen forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssip_tpu.models import ResNet18, ResNet50
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.inference import (
    _s2d_kernel,
    _space_to_depth,
    fold_resnet_extractor,
    make_folded_apply,
)
from ssip_tpu.models.resnet import RESNET18_STAGES


def _rand_input(shape, seed=0):
    # normalized-image-like range
    return jnp.asarray(
        np.random.default_rng(seed).normal(0.0, 1.0, shape).astype(np.float32)
    )


def _perturbed_variables(model, seed, shape):
    """Seeded init + non-trivial BN stats so folding is actually exercised.

    Means stay near 0 and variances near 1 — large offsets would drive every
    activation through ReLU into exact zeros and make equivalence vacuous.
    """
    variables = seeded_init_host(model, seed, shape)
    rng = np.random.default_rng(seed + 1)

    def perturb(path, a):
        name = str(path[-1].key if hasattr(path[-1], "key") else path[-1])
        if name == "var":
            return jnp.asarray(np.abs(rng.normal(1.0, 0.2, a.shape)).astype(np.float32))
        return jnp.asarray(rng.normal(0.0, 0.05, a.shape).astype(np.float32))

    stats = jax.tree_util.tree_map_with_path(perturb, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


@pytest.mark.parametrize("stem_s2d", [False, True])
def test_folded_resnet18_matches_reference_forward(stem_s2d):
    model = ResNet18(num_classes=None)
    variables = _perturbed_variables(model, 0, (1, 64, 64, 3))
    x = _rand_input((4, 64, 64, 3))

    want = model.apply(variables, x, train=False)
    folded = fold_resnet_extractor(variables, stem_s2d=stem_s2d)
    apply = make_folded_apply(stem_s2d=stem_s2d, compute_dtype=jnp.float32)
    got = jax.jit(apply)(folded, x)

    assert got.shape == want.shape == (4, 512)
    assert float(jnp.abs(want).max()) > 1e-3  # non-degenerate comparison
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-3)


def test_folded_resnet50_matches_reference_forward():
    model = ResNet50(num_classes=None)
    variables = _perturbed_variables(model, 1, (1, 64, 64, 3))
    x = _rand_input((2, 64, 64, 3), seed=1)

    want = model.apply(variables, x, train=False)
    folded = fold_resnet_extractor(
        variables, stage_sizes=(3, 4, 6, 3), bottleneck=True, stem_s2d=True
    )
    apply = make_folded_apply(
        stage_sizes=(3, 4, 6, 3), bottleneck=True, stem_s2d=True,
        compute_dtype=jnp.float32,
    )
    got = jax.jit(apply)(folded, x)
    assert got.shape == want.shape == (2, 2048)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-4, rtol=1e-3)


def test_s2d_stem_conv_is_exactly_the_strided_conv():
    """The s2d 4×4 VALID conv reproduces the padded 7×7/2 conv bit-tightly."""
    rng = np.random.default_rng(2)
    k7 = rng.normal(0, 0.1, (7, 7, 3, 8)).astype(np.float32)
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32))

    direct = jax.lax.conv_general_dilated(
        x, jnp.asarray(k7), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    s2d = jax.lax.conv_general_dilated(
        _space_to_depth(xp), jnp.asarray(_s2d_kernel(k7)), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert s2d.shape == direct.shape
    np.testing.assert_allclose(np.asarray(s2d), np.asarray(direct), atol=1e-5)


def test_folded_bf16_close_to_f32_reference():
    model = ResNet18(num_classes=None)
    variables = _perturbed_variables(model, 3, (1, 64, 64, 3))
    x = _rand_input((2, 64, 64, 3), seed=3)

    want = np.asarray(model.apply(variables, x, train=False))
    folded = fold_resnet_extractor(variables, stem_s2d=True)
    got = np.asarray(
        jax.jit(make_folded_apply(stem_s2d=True, compute_dtype=jnp.bfloat16))(
            folded, x
        )
    )
    # bf16 compute: loose numeric agreement, identical ranking structure
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.05)


def test_folded_apply_params_are_arguments_not_closures():
    """Two different folded pytrees through ONE jitted apply → different
    outputs (params are traced args, so the compiled program is reusable)."""
    model = ResNet18(num_classes=None)
    x = _rand_input((1, 64, 64, 3))
    apply = jax.jit(make_folded_apply(compute_dtype=jnp.float32))
    f0 = fold_resnet_extractor(_perturbed_variables(model, 0, (1, 64, 64, 3)))
    f1 = fold_resnet_extractor(_perturbed_variables(model, 7, (1, 64, 64, 3)))
    out0, out1 = apply(f0, x), apply(f1, x)
    assert not np.allclose(np.asarray(out0), np.asarray(out1))

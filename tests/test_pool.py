"""Fusion-friendly stem max-pool ≡ stock XLA max-pool, values AND gradients.

``ssip_tpu.ops.pool._max_pool_custom`` replaces the SelectAndScatter backward
with argmax-routed pads (TPU train path). Gradient routing must stay
bit-identical to ``flax.linen.max_pool``'s autodiff — including on TIES,
which are common in real inputs (the stem pools post-ReLU activations full
of exact zeros): both route to the first maximal element in row-major
window order (torch MaxPool2d semantics).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssip_tpu.ops.pool import _max_pool_custom


def _stock_pool(x):
    return nn.max_pool(
        x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


SHAPES = [(2, 112, 112, 8), (1, 15, 17, 4), (3, 8, 8, 2)]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_bitwise(shape, dtype):
    rng = np.random.default_rng(0)
    # ReLU-like: many exact zeros plus positive values
    x = jnp.asarray(
        np.maximum(rng.standard_normal(shape), 0.0).astype(np.float32)
    ).astype(dtype)
    got = _max_pool_custom(x)
    ref = _stock_pool(x)
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def _pow2_cotangent(rng, shape, dtype=np.float32):
    """±2^e cotangents: any accumulation order of ≤4 window contributions
    is exactly representable, so routing differences show up bitwise while
    legitimate addition-order rounding (SelectAndScatterAdd's order is
    unspecified) cannot."""
    mag = 2.0 ** rng.integers(-2, 3, shape)
    sign = rng.choice([-1.0, 1.0], shape)
    return jnp.asarray((mag * sign).astype(dtype))


@pytest.mark.parametrize("shape", SHAPES)
def test_gradient_routing_bitwise(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = _pow2_cotangent(rng, np.asarray(_stock_pool(x)).shape)

    g_got = jax.grad(lambda z: jnp.sum(_max_pool_custom(z) * w))(x)
    g_ref = jax.grad(lambda z: jnp.sum(_stock_pool(z) * w))(x)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_ref))


@pytest.mark.parametrize("shape", SHAPES)
def test_gradient_close_random_cotangent(shape):
    """Arbitrary cotangents: equal up to addition-order rounding."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(
        np.asarray(_stock_pool(x)).shape).astype(np.float32))
    g_got = jax.grad(lambda z: jnp.sum(_max_pool_custom(z) * w))(x)
    g_ref = jax.grad(lambda z: jnp.sum(_stock_pool(z) * w))(x)
    # atol: a few f32 ulps at contribution magnitude — addition-order noise
    # where cancellation shrinks the sum (routing exactness is asserted by
    # the power-of-two and integer cotangent tests above)
    np.testing.assert_allclose(
        np.asarray(g_got), np.asarray(g_ref), rtol=1e-6, atol=5e-7
    )


def test_gradient_routing_ties():
    """Tie-heavy inputs: quantized values and all-equal (post-ReLU) windows.

    Integer values and integer cotangents make every partial sum exact, so
    this asserts tie ROUTING bitwise: both impls must send the gradient to
    the first maximal element in row-major window order (torch MaxPool2d)."""
    rng = np.random.default_rng(2)
    shape = (2, 32, 32, 4)
    x = jnp.asarray(rng.integers(0, 3, shape).astype(np.float32))
    w = jnp.asarray(rng.integers(-3, 4, (2, 16, 16, 4)).astype(np.float32))
    g_got = jax.grad(lambda z: jnp.sum(_max_pool_custom(z) * w))(x)
    g_ref = jax.grad(lambda z: jnp.sum(_stock_pool(z) * w))(x)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_ref))


def test_gradient_bf16_cotangent():
    """bf16 activations (the train compute dtype) keep exact routing."""
    rng = np.random.default_rng(3)
    shape = (2, 16, 16, 8)
    x32 = np.maximum(rng.standard_normal(shape), 0.0).astype(np.float32)
    x = jnp.asarray(x32).astype(jnp.bfloat16)
    w = _pow2_cotangent(rng, (2, 8, 8, 8)).astype(jnp.bfloat16)
    g_got = jax.grad(
        lambda z: jnp.sum((_max_pool_custom(z) * w).astype(jnp.float32))
    )(x)
    g_ref = jax.grad(
        lambda z: jnp.sum((_stock_pool(z) * w).astype(jnp.float32))
    )(x)
    assert g_got.dtype == g_ref.dtype
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_ref))


def test_full_train_step_with_custom_pool(monkeypatch):
    """One real train step through the custom-backward pool (the TPU train
    configuration, forced on CPU) matches the stock-pool step: same loss
    bitwise (forward is bit-identical) and metrics/grads within addition-
    order rounding."""
    import ssip_tpu.ops.pool as pool_mod
    from ssip_tpu.models import ResNet18
    from ssip_tpu.models.host_init import seeded_init_host
    from ssip_tpu.train.engine import TrainState, make_optimizer, make_train_step

    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.integers(0, 256, (4, 64, 64, 3), np.uint8))
    labels = jnp.asarray([0, 1, 1, 0], jnp.int32)
    valid = jnp.ones((4,), bool)
    key = jax.random.PRNGKey(0)

    model = ResNet18(num_classes=2)
    variables = seeded_init_host(model, 0, (1, 64, 64, 3))

    def run(force_custom):
        monkeypatch.setattr(pool_mod, "_FORCE_CUSTOM", force_custom)
        state = TrainState.create(
            lambda *a, **k: model.apply(*a, **k),
            jax.device_put(variables["params"]),
            jax.device_put(variables["batch_stats"]),
            make_optimizer(1e-3, 1e-4),
        )
        step = make_train_step(augment=True)
        new_state, loss, preds = step(state, images, labels, valid, key)
        return jax.device_get((new_state.params, loss, preds))

    params_custom, loss_custom, preds_custom = run(True)
    params_stock, loss_stock, preds_stock = run(False)
    np.testing.assert_array_equal(loss_custom, loss_stock)
    np.testing.assert_array_equal(preds_custom, preds_stock)
    flat_c = jax.tree_util.tree_leaves(params_custom)
    flat_s = jax.tree_util.tree_leaves(params_stock)
    for c, s in zip(flat_c, flat_s):
        np.testing.assert_allclose(c, s, rtol=2e-5, atol=1e-6)


def test_jit_and_vmap_compose():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 16, 4)).astype(np.float32))
    w = jnp.ones((3, 8, 8, 4), jnp.float32)

    def loss(z):
        return jnp.sum(_max_pool_custom(z) * w)

    g = jax.jit(jax.vmap(jax.grad(loss)))(x)
    g_ref = jax.jit(
        jax.vmap(jax.grad(lambda z: jnp.sum(_stock_pool(z) * w)))
    )(x)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))

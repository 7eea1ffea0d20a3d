"""Sequence/context parallelism (ring attention) for the ViT.

The reference has no attention or sequence axis (its model is a CNN —
reference src/training/common.py:299-304); SP/CP is TPU-native capability
added with the ViT family. The bar mirrors the DP/TP/FSDP/PP tests:
sharding the token axis and ring-rotating K/V may only introduce fp
reassociation noise — the ring attention op, the full forward, the
gradients, and a whole engine train step must match the single-program
model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.vit import VisionTransformer
from ssip_tpu.ops.attention import attention_xla
from ssip_tpu.parallel.mesh import MeshSpec, build_mesh
from ssip_tpu.parallel.sequence import (
    make_ring_attention,
    make_sp_apply_fn,
    make_sp_vit_forward,
)
from ssip_tpu.train.engine import TrainState, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)

IMG = 32
LAYERS = 4


def tiny_vit(num_classes=2):
    return VisionTransformer(
        patch_size=8,
        hidden_dim=64,
        num_layers=LAYERS,
        num_heads=2,
        mlp_dim=128,
        num_classes=num_classes,
    )


def setup(num_classes=2, data=2, model_par=4):
    mesh = build_mesh(MeshSpec(data=data, model=model_par))
    model = tiny_vit(num_classes)
    variables = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, IMG, IMG, 3)).astype(np.float32))
    return mesh, model, variables["params"], x


@pytest.mark.parametrize("seq", [37, 64])  # ragged (pads to 40/4) and exact
def test_ring_attention_matches_one_shot_softmax(seq):
    mesh = build_mesh(MeshSpec(data=2, model=4))
    B, H, Dh = 4, 3, 16
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (B, H, seq, Dh), jnp.float32)
        for i in range(3)
    )
    ref = attention_xla(q, k, v)
    t_pad = -(-seq // 4) * 4
    qp, kp, vp = (
        jnp.pad(a, ((0, 0), (0, 0), (0, t_pad - seq), (0, 0))) for a in (q, k, v)
    )
    ring = make_ring_attention(4, seq, "model")
    f = jax.shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, None, "model", None),) * 3,
        out_specs=P(None, None, "model", None),
    )
    got = jax.jit(f)(qp, kp, vp)[:, :, :seq]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)
    # padded query rows must come out finite (clamped, not 0/0)
    full = jax.jit(f)(qp, kp, vp)
    assert bool(jnp.isfinite(full).all())


def test_ring_attention_grads_match_one_shot_softmax():
    mesh = build_mesh(MeshSpec(data=2, model=4))
    B, H, seq, Dh = 2, 2, 37, 8
    q, k, v = (
        jax.random.normal(jax.random.PRNGKey(i), (B, H, seq, Dh), jnp.float32)
        for i in range(3)
    )
    t_pad = 40
    pad = lambda a: jnp.pad(a, ((0, 0), (0, 0), (0, t_pad - seq), (0, 0)))
    ring = make_ring_attention(4, seq, "model")
    f = jax.shard_map(
        ring,
        mesh=mesh,
        in_specs=(P(None, None, "model", None),) * 3,
        out_specs=P(None, None, "model", None),
    )

    def ring_loss(q, k, v):
        return jnp.sum(f(pad(q), pad(k), pad(v))[:, :, :seq] ** 2)

    def ref_loss(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    got = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    ref = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2)))(q, k, v)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)


@pytest.mark.parametrize("data,model_par", [(2, 4), (1, 8)])
def test_sp_forward_matches_plain(data, model_par):
    # IMG=32/p8 -> 17 tokens: ragged over both 4 and 8 shards
    mesh, model, params, x = setup(data=data, model_par=model_par)
    ref = model.apply({"params": params}, x)
    forward = make_sp_vit_forward(model, mesh)
    with mesh:
        got = jax.jit(forward)(
            params, jax.device_put(x, NamedSharding(mesh, P("data")))
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_sp_feature_extractor_mode():
    mesh, model, params, x = setup(num_classes=None)
    ref = model.apply({"params": params}, x)
    forward = make_sp_vit_forward(model, mesh)
    with mesh:
        feats = jax.jit(forward)(params, x)
    assert feats.shape == (8, 64)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref), atol=2e-5)


def test_sp_gradients_match_plain():
    mesh, model, params, x = setup()
    labels = jnp.asarray(np.array([0, 1] * 4, dtype=np.int32))
    forward = make_sp_vit_forward(model, mesh)

    def plain_loss(p):
        logits = model.apply({"params": p}, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    def sp_loss(p):
        return optax.softmax_cross_entropy_with_integer_labels(
            forward(p, x), labels
        ).mean()

    ref_loss, ref_grads = jax.value_and_grad(plain_loss)(params)
    with mesh:
        got_loss, got_grads = jax.jit(jax.value_and_grad(sp_loss))(params)
    assert np.isclose(float(got_loss), float(ref_loss), atol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        got_grads,
        ref_grads,
    )


def test_sp_train_step_matches_plain():
    """One full engine train step through the SP apply_fn == the plain
    replicated step. SGD, not AdamW, for the same oracle-conditioning
    reason as the PP test (AdamW's first step is ~sign(g)·lr and amplifies
    fp-noise sign flips on near-zero grads); params stay in the PLAIN
    layout, so no merge step is needed."""
    mesh, model, params, _ = setup()
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.integers(0, 256, (8, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray((np.arange(8) % 2).astype(np.int32))
    valid = jnp.ones(8, dtype=bool)
    tx = optax.sgd(0.1)
    step = make_train_step(augment=False)

    plain_state = TrainState.create(
        apply_fn=model.apply, params=params, batch_stats={}, tx=tx
    )
    plain_new, plain_loss, plain_preds = step(
        plain_state, images, labels, valid, jax.random.key(0)
    )

    sp_state = TrainState.create(
        apply_fn=make_sp_apply_fn(model, mesh),
        params=params,
        batch_stats={},
        tx=tx,
    )
    with mesh:
        sp_new, sp_loss, sp_preds = step(
            sp_state, images, labels, valid, jax.random.key(0)
        )

    assert np.isclose(float(sp_loss), float(plain_loss), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sp_preds), np.asarray(plain_preds))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        sp_new.params,
        plain_new.params,
    )

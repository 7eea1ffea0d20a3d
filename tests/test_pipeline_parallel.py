"""Pipeline parallelism (GPipe over the mesh ``model`` axis) for the ViT.

The reference has no pipeline parallelism and no model deeper than one
device (SURVEY §2.2); PP is TPU-native capability added with the ViT
family. The bar mirrors the DP/TP/FSDP tests: sharding the encoder into
ring-pipelined stages may only introduce fp reassociation noise — the
forward, the gradients, and a full optimizer step must match the plain
single-program model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.vit import VisionTransformer
from ssip_tpu.parallel.mesh import MeshSpec, build_mesh
from ssip_tpu.parallel.pipeline import (
    make_pipelined_vit_forward,
    make_pp_apply_fn,
    merge_stage_params,
    pp_param_shardings,
    split_stage_params,
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


def place(mesh, params, num_stages):
    outer, stacked = split_stage_params(params, LAYERS, num_stages)
    pp = {"outer": outer, "stacked": stacked}
    return jax.device_put(pp, pp_param_shardings(mesh, pp))


def test_split_merge_roundtrip():
    _, _, params, _ = setup()
    outer, stacked = split_stage_params(params, LAYERS, 4)
    leaf = jax.tree.leaves(stacked)[0]
    assert leaf.shape[:2] == (4, 1)
    merged = merge_stage_params(outer, stacked)
    jax.tree.map(np.testing.assert_array_equal, merged, params)


@pytest.mark.parametrize("microbatches", [1, 2, 4])
def test_pp_forward_matches_plain(microbatches):
    mesh, model, params, x = setup()
    ref = model.apply({"params": params}, x)
    pp = place(mesh, params, 4)
    forward = make_pipelined_vit_forward(model, mesh, microbatches)
    with mesh:
        got = forward(pp["outer"], pp["stacked"], x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pp_feature_extractor_mode():
    mesh, model, params, x = setup(num_classes=None)
    ref = model.apply({"params": params}, x)
    pp = place(mesh, params, 4)
    forward = make_pipelined_vit_forward(model, mesh, 2)
    with mesh:
        feats = forward(pp["outer"], pp["stacked"], x)
    assert feats.shape == (8, 64)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(ref), atol=2e-5)


def test_pp_gradients_match_plain():
    mesh, model, params, x = setup()
    labels = jnp.asarray(np.array([0, 1] * 4, dtype=np.int32))

    def plain_loss(p):
        logits = model.apply({"params": p}, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    ref_loss, ref_grads = jax.value_and_grad(plain_loss)(params)

    pp = place(mesh, params, 4)
    forward = make_pipelined_vit_forward(model, mesh, 2)

    def pp_loss(p):
        logits = forward(p["outer"], p["stacked"], x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()

    with mesh:
        got_loss, got_grads = jax.value_and_grad(pp_loss)(pp)
    assert np.isclose(float(got_loss), float(ref_loss), atol=1e-6)
    merged = merge_stage_params(got_grads["outer"], got_grads["stacked"])
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        merged,
        ref_grads,
    )


def test_pp_train_step_matches_plain():
    """One full engine train step through the PP apply_fn == the plain
    replicated step, parameter-for-parameter after merging.

    SGD, not AdamW, for the comparison: AdamW's first step is ~sign(g)·lr,
    which amplifies fp-noise sign flips on near-zero gradients into full
    ±lr disagreements — an ill-conditioned oracle. SGD is linear in the
    gradients, so this asserts the same parity the gradient test does but
    through the whole engine step (preprocess → loss → update). AdamW
    under PP is exercised by __graft_entry__.dryrun_multichip's vit-pp
    stage on every driver run.
    """
    mesh, model, params, _ = setup()
    rng = np.random.default_rng(2)
    images = jnp.asarray(
        rng.integers(0, 256, (8, IMG, IMG, 3), dtype=np.uint8)
    )
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

    pp_params = place(mesh, params, 4)
    pp_state = TrainState.create(
        apply_fn=make_pp_apply_fn(model, mesh, 2),
        params=pp_params,
        batch_stats={},
        tx=tx,
    )
    with mesh:
        pp_new, pp_loss, pp_preds = step(
            pp_state, images, labels, valid, jax.random.key(0)
        )

    assert np.isclose(float(pp_loss), float(plain_loss), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pp_preds), np.asarray(plain_preds))
    merged = merge_stage_params(
        pp_new.params["outer"], pp_new.params["stacked"]
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        merged,
        plain_new.params,
    )
    # the stage params (and so their AdamW moments) genuinely live 1/S-sharded
    leaf = pp_new.params["stacked"]["qkv"]["kernel"]
    assert leaf.addressable_shards[0].data.shape[0] == 1  # 1 of 4 stages


def test_pp_rejects_bad_shapes():
    mesh, model, params, x = setup()
    with pytest.raises(ValueError):
        split_stage_params(params, LAYERS, 3)  # 4 blocks, 3 stages
    forward = make_pipelined_vit_forward(model, mesh, 3)
    pp = place(mesh, params, 4)
    with pytest.raises(ValueError):  # batch 8 not divisible into 3 microbatches
        with mesh:
            forward(pp["outer"], pp["stacked"], x)

"""FSDP (ZeRO-3-style) parameter/optimizer sharding over the data axis.

The reference is single-device (reference src/training/common.py:55); FSDP
is TPU-native capability: ``--fsdp`` annotates every big parameter and its
optimizer moments with a 1/N sharding over the mesh data axis and lets
XLA's SPMD partitioner insert the all-gathers/reduce-scatters. The bar is
the same as for DP/TP: sharding may only introduce fp reduction-order
noise, never change the trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ssip_tpu.models import MODEL_FACTORIES
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.parallel.mesh import (
    FSDP_MIN_ELEMENTS,
    MeshSpec,
    build_mesh,
    fsdp_param_spec,
    tree_shardings,
)
from ssip_tpu.train.engine import (
    DeviceDataset,
    TrainState,
    make_optimizer,
    make_train_step,
    train_model,
)

IMG = 32

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)


def _vit_state(tx):
    model = MODEL_FACTORIES["vit_t16"](num_classes=2)
    variables = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    return model, TrainState.create(
        apply_fn=model.apply, params=variables["params"], batch_stats={}, tx=tx
    )


def test_fsdp_spec_rules():
    class Leaf:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)
            self.size = int(np.prod(shape))

    def names(*parts):
        return tuple(jax.tree_util.DictKey(p) for p in parts)

    # big 2-D kernel, no TP: largest divisible axis takes the data axis
    spec = fsdp_param_spec(
        names("block0", "qkv", "kernel"), Leaf((192, 576)), 8, 1
    )
    assert spec == jax.sharding.PartitionSpec(None, "data")
    # composes with TP: qkv is column-parallel on axis 1, FSDP takes axis 0
    spec = fsdp_param_spec(
        names("block0", "qkv", "kernel"), Leaf((192, 576)), 4, 2
    )
    assert spec == jax.sharding.PartitionSpec("data", "model")
    # small leaves replicate (LN scale, biases)
    spec = fsdp_param_spec(names("ln", "scale"), Leaf((192,)), 8, 1)
    assert spec == jax.sharding.PartitionSpec()
    # indivisible axes are skipped (197-token pos embedding: axis 2 taken)
    spec = fsdp_param_spec(
        names("pos_embedding"), Leaf((1, 197, 768)), 8, 1
    )
    assert spec == jax.sharding.PartitionSpec(None, None, "data")


def test_fsdp_step_matches_replicated():
    """One SGD step with FSDP-sharded params == the unsharded step."""
    model, ref_state = _vit_state(optax.sgd(1e-2))

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.integers(0, 255, (8, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray(np.arange(8) % 2, jnp.int32)
    valid = jnp.ones(8, bool)
    step = make_train_step(augment=False)
    ref_new, ref_loss, _ = step(ref_state, images, labels, valid, jax.random.key(0))

    mesh = build_mesh(MeshSpec(data=8), devices=jax.devices()[:8])
    _, state = _vit_state(optax.sgd(1e-2))
    state = jax.device_put(state, tree_shardings(mesh, state, fsdp=True))

    # params AND optimizer momentum-free sgd state are actually sharded
    qkv = state.params["block0"]["qkv"]["kernel"]
    assert "data" in str(qkv.sharding.spec)
    assert qkv.addressable_shards[0].data.size * 8 == qkv.size

    from jax.sharding import NamedSharding, PartitionSpec as P

    data_sh = NamedSharding(mesh, P("data"))
    fsdp_new, fsdp_loss, _ = step(
        state,
        jax.device_put(images, data_sh),
        jax.device_put(labels, data_sh),
        jax.device_put(valid, data_sh),
        jax.random.key(0),
    )
    np.testing.assert_allclose(float(fsdp_loss), float(ref_loss), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_new.params),
        jax.tree_util.tree_leaves(fsdp_new.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # the updated params keep their FSDP sharding (no silent re-replication)
    assert "data" in str(fsdp_new.params["block0"]["qkv"]["kernel"].sharding.spec)


def test_fsdp_adamw_moments_sharded():
    """AdamW mu/nu mirror the param shardings under FSDP."""
    mesh = build_mesh(MeshSpec(data=8), devices=jax.devices()[:8])
    _, state = _vit_state(make_optimizer(1e-3, 1e-4))
    state = jax.device_put(state, tree_shardings(mesh, state, fsdp=True))
    adam_state = state.opt_state.inner_state[0]
    mu_qkv = adam_state.mu["block0"]["qkv"]["kernel"]
    assert mu_qkv.size >= FSDP_MIN_ELEMENTS
    assert "data" in str(mu_qkv.sharding.spec), mu_qkv.sharding
    assert mu_qkv.addressable_shards[0].data.size * 8 == mu_qkv.size


def test_fsdp_train_model_matches_replicated_epoch0():
    """The full epoch driver under fsdp=True tracks the replicated run."""
    mesh = build_mesh(MeshSpec(data=8), devices=jax.devices()[:8])
    rng = np.random.default_rng(2)
    ds = DeviceDataset.create(
        jnp.asarray(rng.integers(0, 255, (16, IMG, IMG, 3), dtype=np.uint8)),
        (np.arange(16) % 2).astype(np.int64),
    )

    histories = {}
    for fsdp in (False, True):
        _, state = _vit_state(make_optimizer(1e-3, 1e-4))
        _, hist = train_model(
            state, ds, ds, num_epochs=2, batch_size=8, seed=0,
            stream_name="fsdp_test", mesh=mesh, fsdp=fsdp,
        )
        histories[fsdp] = hist
    # graduated like the DP-invariance test: epoch 0 tight; epoch 1 looser
    # (Adam's g/√(g²) amplifies reduction noise across steps)
    for key in ("train_loss", "val_loss"):
        np.testing.assert_allclose(
            histories[False][key][0], histories[True][key][0], rtol=4e-2,
            err_msg=f"{key}[0]",
        )
    assert np.isfinite(histories[True]["val_loss"]).all()

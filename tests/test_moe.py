"""MoE ViT (Switch-style top-1 routing) + expert parallelism.

The reference has a single dense backbone (reference
src/training/common.py:299-304) — MoE is TPU-native capability, so the
oracle is algebra, not torch: a 1-expert MoE layer must equal the dense MLP
with the same weights, capacity overflow must drop exactly the
latest-routed tokens, the load-balance loss has a closed form under a
zeroed router, and expert-parallel sharding may only introduce fp
reduction-order noise vs the replicated program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ssip_tpu.models import MODEL_FACTORIES
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.moe import MoEMlp, MoEVisionTransformer
from ssip_tpu.parallel.mesh import MeshSpec, build_mesh, tree_shardings
from ssip_tpu.train.engine import TrainState, make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual CPU mesh"
)

IMG = 32


def tiny_moe(num_classes=2, num_experts=4, **kw):
    return MoEVisionTransformer(
        patch_size=8, hidden_dim=64, num_layers=4, num_heads=2, mlp_dim=128,
        num_experts=num_experts, num_classes=num_classes, **kw,
    )


def test_single_expert_matches_dense_mlp():
    """E=1 with capacity >= S degenerates to the plain MLP (gate == 1)."""
    layer = MoEMlp(num_experts=1, mlp_dim=32, capacity_factor=1.0)
    y = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, 16)), jnp.float32)
    variables = layer.init(jax.random.key(0), y)
    out = layer.apply(variables, y)
    p = variables["params"]
    h = jax.nn.gelu(y @ p["w_in"][0] + p["b_in"][0], approximate=False)
    dense = h @ p["w_out"][0] + p["b_out"][0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-6)


def test_capacity_overflow_drops_latest_tokens():
    """All tokens routed to expert 0; tokens past capacity output zeros."""
    S, E, D = 8, 2, 16
    layer = MoEMlp(num_experts=E, mlp_dim=32, capacity_factor=0.5)  # cap=2
    y = jnp.asarray(np.random.default_rng(1).normal(size=(1, S, D)), jnp.float32)
    variables = layer.init(jax.random.key(0), y)
    params = jax.tree.map(jnp.asarray, variables["params"])
    # zero router -> uniform probs -> argmax picks expert 0 for every token
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
    out = layer.apply({"params": params}, y)
    cap = 2  # ceil(8 * 0.5 / 2)
    assert bool(jnp.any(jnp.abs(out[0, :cap]) > 0))
    np.testing.assert_array_equal(np.asarray(out[0, cap:]), 0.0)


def test_aux_loss_closed_form_under_zero_router():
    """Zero router: P_e = 1/E, all tokens argmax to expert 0 -> f = e_0, so
    aux = E * sum(f * P) = E * (1/E) = 1, sown scaled by the coefficient."""
    E, coef = 4, 0.01
    layer = MoEMlp(num_experts=E, mlp_dim=32, aux_loss_coef=coef)
    y = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 16)), jnp.float32)
    variables = layer.init(jax.random.key(0), y)
    params = jax.tree.map(jnp.asarray, variables["params"])
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
    params["router"]["bias"] = jnp.zeros_like(params["router"]["bias"])
    _, state = layer.apply({"params": params}, y, mutable=["aux"])
    (leaf,) = jax.tree.leaves(dict(state)["aux"])
    np.testing.assert_allclose(float(leaf), coef * 1.0, atol=1e-6)


def test_moe_vit_forward_and_feature_modes():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, IMG, IMG, 3)).astype(np.float32))
    clf = tiny_moe(num_classes=2)
    v = seeded_init_host(clf, 0, (1, IMG, IMG, 3))
    logits = clf.apply(v, x)
    assert logits.shape == (4, 2) and bool(jnp.isfinite(logits).all())
    feat = tiny_moe(num_classes=None)
    fv = seeded_init_host(feat, 0, (1, IMG, IMG, 3))
    feats = feat.apply(fv, x)
    assert feats.shape == (4, 64) and bool(jnp.isfinite(feats).all())
    # blocks 1 and 3 are MoE (every-other placement), 0 and 2 dense
    assert "moe" in v["params"]["block1"] and "moe" in v["params"]["block3"]
    assert "mlp_1" in v["params"]["block0"] and "mlp_1" in v["params"]["block2"]
    # host init gives live expert kernels (not the zeros default)
    w_in = v["params"]["block1"]["moe"]["w_in"]
    assert float(jnp.abs(w_in).mean()) > 1e-3


def test_engine_train_step_adds_aux_loss_and_flows_router_grads():
    model = tiny_moe()
    v = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.integers(0, 256, (8, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray((np.arange(8) % 2).astype(np.int32))
    valid = jnp.ones(8, bool)
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats={}, tx=optax.sgd(0.1)
    )
    step = make_train_step(augment=False)
    new_state, loss, _ = step(state, images, labels, valid, jax.random.key(0))

    # reproduce the loss by hand: CE + sum of sown aux terms
    from ssip_tpu.ops.augment import eval_preprocess

    x = eval_preprocess(images)
    logits, st = model.apply(
        {"params": v["params"]}, x, train=True, mutable=["batch_stats", "aux"]
    )
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    aux = sum(float(t) for t in jax.tree.leaves(dict(st)["aux"]))
    assert aux > 0
    np.testing.assert_allclose(float(loss), float(ce) + aux, rtol=1e-6)

    # the router and experts both moved (gradients flow through gate + aux)
    for name in ("router", "w_in", "w_out"):
        old = v["params"]["block1"]["moe"][name]
        new = new_state.params["block1"]["moe"][name]
        old = old["kernel"] if isinstance(old, dict) else old
        new = new["kernel"] if isinstance(new, dict) else new
        assert float(jnp.abs(new - old).max()) > 0, f"{name} did not update"


def test_ep_param_specs():
    mesh = build_mesh(MeshSpec(data=2, model=4))
    model = tiny_moe(num_experts=8)
    v = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    sh = tree_shardings(mesh, v["params"])
    moe = sh["block1"]["moe"]
    for name in ("w_in", "w_out", "b_in", "b_out"):
        assert moe[name].spec == P("model"), (name, moe[name].spec)
    # the router replicates; attention follows the Megatron TP rules
    assert moe["router"]["kernel"].spec == P()
    assert sh["block1"]["qkv"]["kernel"].spec == P(None, "model")


@pytest.mark.parametrize("data,model_par", [(2, 4), (1, 8)])
def test_ep_forward_matches_replicated(data, model_par):
    model = tiny_moe(num_experts=8, num_classes=2)
    v = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(8, IMG, IMG, 3)).astype(np.float32))
    ref = model.apply(v, x)

    mesh = build_mesh(MeshSpec(data=data, model=model_par))
    params = jax.device_put(v["params"], tree_shardings(mesh, v["params"]))
    # experts actually shard 1/model_par across devices
    w_in = params["block1"]["moe"]["w_in"]
    assert w_in.addressable_shards[0].data.shape[0] * model_par == w_in.shape[0]
    with mesh:
        got = jax.jit(lambda p, x: model.apply({"params": p}, x))(
            params, jax.device_put(x, NamedSharding(mesh, P("data")))
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ep_train_step_matches_replicated():
    """One engine SGD step with experts sharded over the model axis == the
    single-program step (fp reduction-order tolerance only)."""
    model = tiny_moe(num_experts=8)
    v = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    rng = np.random.default_rng(6)
    images = jnp.asarray(rng.integers(0, 256, (8, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray((np.arange(8) % 2).astype(np.int32))
    valid = jnp.ones(8, bool)
    step = make_train_step(augment=False)

    ref_state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats={}, tx=optax.sgd(0.1)
    )
    ref_new, ref_loss, ref_preds = step(
        ref_state, images, labels, valid, jax.random.key(0)
    )

    mesh = build_mesh(MeshSpec(data=2, model=4))
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats={}, tx=optax.sgd(0.1)
    )
    state = jax.device_put(state, tree_shardings(mesh, state))
    data_sh = NamedSharding(mesh, P("data"))
    with mesh:
        ep_new, ep_loss, ep_preds = step(
            state,
            jax.device_put(images, data_sh),
            jax.device_put(labels, data_sh),
            jax.device_put(valid, data_sh),
            jax.random.key(0),
        )
    np.testing.assert_allclose(float(ep_loss), float(ref_loss), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ep_preds), np.asarray(ref_preds))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        ep_new.params,
        ref_new.params,
    )
    # the updated experts keep their EP sharding (no silent re-replication)
    assert "model" in str(ep_new.params["block1"]["moe"]["w_in"].sharding.spec)


def test_moe_arch_registered():
    for arch in ("vit_moe_s16", "vit_moe_t16"):
        assert arch in MODEL_FACTORIES
        m = MODEL_FACTORIES[arch](num_classes=3)
        assert isinstance(m, MoEVisionTransformer)
        assert m.num_classes == 3


def test_top2_with_two_experts_is_exact_soft_mixture():
    """E=2, top-2, ample capacity: the layer equals the dense soft mixture
    sum_e softmax(router)_e * mlp_e(y) exactly (renormalized top-2 gates
    over both experts ARE the softmax probabilities)."""
    layer = MoEMlp(num_experts=2, mlp_dim=32, capacity_factor=4.0, router_top_k=2)
    y = jnp.asarray(np.random.default_rng(7).normal(size=(2, 9, 16)), jnp.float32)
    variables = layer.init(jax.random.key(3), y)
    out = layer.apply(variables, y)

    p = variables["params"]
    probs = jax.nn.softmax(
        y @ p["router"]["kernel"] + p["router"]["bias"], axis=-1
    )  # [B, S, 2]
    mix = 0.0
    for ei in range(2):
        h = jax.nn.gelu(y @ p["w_in"][ei] + p["b_in"][ei], approximate=False)
        mix = mix + probs[..., ei : ei + 1] * (h @ p["w_out"][ei] + p["b_out"][ei])
    np.testing.assert_allclose(np.asarray(out), np.asarray(mix), atol=1e-5)


def test_top2_aux_loss_closed_form_and_capacity():
    """Zero router, k=2: every token picks experts {0, 1}; f = (1, 1, 0, 0),
    P = 1/E, so aux = (E/k)·sum(f·P) = (E/2)·(2/E) = 1 (balanced value is
    k-invariant). Capacity counts assignments: cap = ceil(S·k·cf/E)."""
    E, coef = 4, 0.01
    layer = MoEMlp(num_experts=E, mlp_dim=32, aux_loss_coef=coef, router_top_k=2)
    y = jnp.asarray(np.random.default_rng(8).normal(size=(2, 5, 16)), jnp.float32)
    variables = layer.init(jax.random.key(0), y)
    params = jax.tree.map(jnp.asarray, variables["params"])
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
    params["router"]["bias"] = jnp.zeros_like(params["router"]["bias"])
    _, state = layer.apply({"params": params}, y, mutable=["aux"])
    (leaf,) = jax.tree.leaves(dict(state)["aux"])
    np.testing.assert_allclose(float(leaf), coef * 1.0, atol=1e-6)


def test_top2_vit_trains_and_shards():
    """A top-2 MoE ViT runs one EP-sharded engine step matching the
    replicated program (same bar as the top-1 path)."""
    model = MoEVisionTransformer(
        patch_size=8, hidden_dim=64, num_layers=2, num_heads=2, mlp_dim=128,
        num_experts=8, router_top_k=2, num_classes=2,
    )
    v = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.integers(0, 256, (8, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray((np.arange(8) % 2).astype(np.int32))
    valid = jnp.ones(8, bool)
    step = make_train_step(augment=False)

    ref_state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats={}, tx=optax.sgd(0.1)
    )
    ref_new, ref_loss, _ = step(ref_state, images, labels, valid, jax.random.key(0))
    assert np.isfinite(float(ref_loss))

    mesh = build_mesh(MeshSpec(data=2, model=4))
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats={}, tx=optax.sgd(0.1)
    )
    state = jax.device_put(state, tree_shardings(mesh, state))
    data_sh = NamedSharding(mesh, P("data"))
    with mesh:
        ep_new, ep_loss, _ = step(
            state,
            jax.device_put(images, data_sh),
            jax.device_put(labels, data_sh),
            jax.device_put(valid, data_sh),
            jax.random.key(0),
        )
    np.testing.assert_allclose(float(ep_loss), float(ref_loss), atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        ep_new.params,
        ref_new.params,
    )


def test_expert_choice_single_expert_full_capacity_is_dense():
    """EC with one expert and C=S: the expert picks every token with gate
    softmax(1 logit)=1, so the layer equals the dense MLP exactly."""
    layer = MoEMlp(
        num_experts=1, mlp_dim=32, capacity_factor=1.0, routing="expert_choice"
    )
    y = jnp.asarray(np.random.default_rng(10).normal(size=(2, 7, 16)), jnp.float32)
    variables = layer.init(jax.random.key(0), y)
    out = layer.apply(variables, y)
    p = variables["params"]
    h = jax.nn.gelu(y @ p["w_in"][0] + p["b_in"][0], approximate=False)
    dense = h @ p["w_out"][0] + p["b_out"][0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-6)


def test_expert_choice_balanced_and_sows_nothing():
    """Zero router, E=2, S=8, cf=1 -> C=4: ties resolve to the lowest token
    indices, so BOTH experts take tokens 0..3 (each with affinity 1/2) and
    tokens 4..7 get no expert (zero residual branch). No aux loss exists —
    expert choice is balanced by construction."""
    layer = MoEMlp(
        num_experts=2, mlp_dim=32, capacity_factor=1.0, routing="expert_choice"
    )
    y = jnp.asarray(np.random.default_rng(11).normal(size=(1, 8, 16)), jnp.float32)
    variables = layer.init(jax.random.key(0), y)
    params = jax.tree.map(jnp.asarray, variables["params"])
    params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
    params["router"]["bias"] = jnp.zeros_like(params["router"]["bias"])
    out, state = layer.apply({"params": params}, y, mutable=["aux"])
    assert not dict(state)  # nothing sown
    np.testing.assert_array_equal(np.asarray(out[0, 4:]), 0.0)
    # the chosen tokens get 0.5*(mlp_0 + mlp_1)
    mix = 0.0
    for ei in range(2):
        h = jax.nn.gelu(y @ params["w_in"][ei] + params["b_in"][ei], approximate=False)
        mix = mix + 0.5 * (h @ params["w_out"][ei] + params["b_out"][ei])
    np.testing.assert_allclose(
        np.asarray(out[0, :4]), np.asarray(mix[0, :4]), atol=1e-5
    )


def test_expert_choice_vit_ep_step_matches_replicated():
    model = MoEVisionTransformer(
        patch_size=8, hidden_dim=64, num_layers=2, num_heads=2, mlp_dim=128,
        num_experts=8, routing="expert_choice", num_classes=2,
    )
    v = seeded_init_host(model, 0, (1, IMG, IMG, 3))
    rng = np.random.default_rng(12)
    images = jnp.asarray(rng.integers(0, 256, (8, IMG, IMG, 3), dtype=np.uint8))
    labels = jnp.asarray((np.arange(8) % 2).astype(np.int32))
    valid = jnp.ones(8, bool)
    step = make_train_step(augment=False)

    ref_state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats={}, tx=optax.sgd(0.1)
    )
    ref_new, ref_loss, _ = step(ref_state, images, labels, valid, jax.random.key(0))
    assert np.isfinite(float(ref_loss))
    # the router updates (gradients flow through the affinity gates)
    r_delta = float(
        jnp.abs(
            ref_new.params["block1"]["moe"]["router"]["kernel"]
            - v["params"]["block1"]["moe"]["router"]["kernel"]
        ).max()
    )
    assert r_delta > 0

    mesh = build_mesh(MeshSpec(data=2, model=4))
    state = TrainState.create(
        apply_fn=model.apply, params=v["params"], batch_stats={}, tx=optax.sgd(0.1)
    )
    state = jax.device_put(state, tree_shardings(mesh, state))
    data_sh = NamedSharding(mesh, P("data"))
    with mesh:
        ep_new, ep_loss, _ = step(
            state,
            jax.device_put(images, data_sh),
            jax.device_put(labels, data_sh),
            jax.device_put(valid, data_sh),
            jax.random.key(0),
        )
    np.testing.assert_allclose(float(ep_loss), float(ref_loss), atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4
        ),
        ep_new.params,
        ref_new.params,
    )


def test_router_z_loss_closed_form():
    """Zero router, coef>0: logsumexp(logits) = log(E) per token, so the
    sown z-loss is exactly coef * log(E)^2 — for both routing families."""
    E, coef = 4, 1e-3
    y = jnp.asarray(np.random.default_rng(13).normal(size=(2, 5, 16)), jnp.float32)
    for routing in ("token_choice", "expert_choice"):
        layer = MoEMlp(
            num_experts=E, mlp_dim=32, router_z_loss_coef=coef, routing=routing
        )
        variables = layer.init(jax.random.key(0), y)
        params = jax.tree.map(jnp.asarray, variables["params"])
        params["router"]["kernel"] = jnp.zeros_like(params["router"]["kernel"])
        params["router"]["bias"] = jnp.zeros_like(params["router"]["bias"])
        _, state = layer.apply({"params": params}, y, mutable=["aux"])
        aux = dict(state)["aux"]
        (z_leaf,) = jax.tree.leaves(aux["router_z"])
        np.testing.assert_allclose(
            float(z_leaf), coef * float(np.log(E)) ** 2, rtol=1e-6
        )

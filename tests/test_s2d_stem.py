"""Space-to-depth stem reparametrization (models/resnet.py:StemConv).

The s2d path must be the SAME arithmetic as the direct 7×7/2 conv —
re-associated only — for values and gradients, with the parameter tree
(torchvision ``conv1/kernel`` shape) unchanged, single-device AND under
the TP mesh (the hole the round-3 regression slipped through). The
default scope is TPU training only: on other backends the reparametrized
program draws a different conv-backward lowering per mesh layout, whose
fp noise the BN net chaos-amplifies past the device-count invariance
bounds (tests/test_mesh_training.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssip_tpu.models import ResNet18
from ssip_tpu.models.host_init import seeded_init_host
from ssip_tpu.models.resnet import StemConv


def _stem_outputs(monkeypatch, x, enabled):
    monkeypatch.setenv("SSIP_S2D_STEM", "1" if enabled else "0")
    module = StemConv(64)
    variables = module.init(jax.random.key(0), x)
    return module, variables


class TestS2DStem:
    def test_matches_direct_conv_values(self, monkeypatch):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 32, 48, 3)).astype(np.float32))
        module, variables = _stem_outputs(monkeypatch, x, enabled=False)
        direct = module.apply(variables, x)
        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        s2d = module.apply(variables, x)
        assert direct.shape == s2d.shape == (2, 16, 24, 64)
        np.testing.assert_allclose(
            np.asarray(direct), np.asarray(s2d), rtol=1e-5, atol=1e-5
        )

    def test_matches_direct_conv_gradients(self, monkeypatch):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 28, 28, 3)).astype(np.float32))
        module, variables = _stem_outputs(monkeypatch, x, enabled=False)
        cot = jnp.asarray(rng.normal(size=(1, 14, 14, 64)).astype(np.float32))

        def scalar(v, inp):
            return jnp.sum(module.apply(v, inp) * cot)

        monkeypatch.setenv("SSIP_S2D_STEM", "0")
        gk_direct, gx_direct = jax.grad(scalar, argnums=(0, 1))(variables, x)
        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        gk_s2d, gx_s2d = jax.grad(scalar, argnums=(0, 1))(variables, x)
        np.testing.assert_allclose(
            np.asarray(gk_direct["params"]["kernel"]),
            np.asarray(gk_s2d["params"]["kernel"]),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(gx_direct), np.asarray(gx_s2d), rtol=1e-4, atol=1e-5
        )

    def test_odd_spatial_falls_back(self, monkeypatch):
        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        x = jnp.zeros((1, 31, 33, 3), jnp.float32)
        module = StemConv(64)
        variables = module.init(jax.random.key(0), x)
        # ceil(31/2), ceil(33/2) — stock strided-conv output arithmetic
        assert module.apply(variables, x).shape == (1, 16, 17, 64)

    def test_param_tree_is_torchvision_shaped(self):
        variables = seeded_init_host(ResNet18(num_classes=2), 0, (1, 32, 32, 3))
        kernel = variables["params"]["conv1"]["kernel"]
        assert kernel.shape == (7, 7, 3, 64)

    def test_default_scope_is_tpu_train_only(self, monkeypatch):
        """Inference measured s2d as a loss on v5e (models/inference.py:25-32);
        non-TPU backends keep the direct conv so per-mesh conv-lowering noise
        cannot break the device-count invariance suite (round-3 verdict)."""
        from ssip_tpu.models.resnet import _s2d_stem_enabled

        on_tpu = jax.default_backend() == "tpu"
        monkeypatch.delenv("SSIP_S2D_STEM", raising=False)
        assert _s2d_stem_enabled(train=True) is on_tpu
        assert _s2d_stem_enabled(train=False) is False
        monkeypatch.setenv("SSIP_S2D_STEM", "train")
        assert _s2d_stem_enabled(train=True) is True
        assert _s2d_stem_enabled(train=False) is False
        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        assert _s2d_stem_enabled(train=False) is True
        monkeypatch.setenv("SSIP_S2D_STEM", "0")
        assert _s2d_stem_enabled(train=True) is False

    def test_forward_matches_unsharded_under_tp_mesh(self, monkeypatch):
        """s2d forced ON under a (data=4, model=2) mesh: the full train-mode
        forward must equal the unsharded one — the structural hole the
        round-3 regression slipped through (single-device-only coverage).
        Loose enough for GSPMD reduction-order noise, 100× tighter than any
        wrong-halo/wrong-padding failure mode."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ssip_tpu.parallel.mesh import MeshSpec, build_mesh, tree_shardings

        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        model = ResNet18(num_classes=2)
        variables = seeded_init_host(model, 0, (1, 32, 32, 3))
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
        valid = jnp.ones(8, bool)

        def fwd(params, batch_stats, xx):
            logits, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                xx, train=True, mask=valid, mutable=["batch_stats", "aux"],
            )
            return logits

        ref = jax.jit(fwd)(variables["params"], variables["batch_stats"], x)
        mesh = build_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
        params_tp = jax.device_put(
            variables["params"], tree_shardings(mesh, variables["params"])
        )
        stats_tp = jax.device_put(
            variables["batch_stats"], tree_shardings(mesh, variables["batch_stats"])
        )
        got = jax.jit(fwd)(
            params_tp, stats_tp, jax.device_put(x, NamedSharding(mesh, P("data")))
        )
        np.testing.assert_allclose(
            np.asarray(ref), np.asarray(got), atol=1e-4, rtol=1e-4
        )

    def test_gradients_match_unsharded_under_tp_mesh(self, monkeypatch):
        """s2d forced ON under the TP mesh: per-leaf gradient rel-norm vs
        the unsharded grads stays at fp-lowering-noise level (measured
        ~2e-5; bound 1e-3 — structural breakage is O(1))."""
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ssip_tpu.parallel.mesh import MeshSpec, build_mesh, tree_shardings

        monkeypatch.setenv("SSIP_S2D_STEM", "1")
        model = ResNet18(num_classes=2)
        variables = seeded_init_host(model, 0, (1, 32, 32, 3))
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
        labels = jnp.asarray((np.arange(8) % 2).astype(np.int32))
        valid = jnp.ones(8, bool)

        def loss_fn(params, batch_stats, xx):
            logits, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                xx, train=True, mask=valid, mutable=["batch_stats", "aux"],
            )
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        g_ref = jax.jit(jax.grad(loss_fn))(
            variables["params"], variables["batch_stats"], x
        )
        mesh = build_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
        params_tp = jax.device_put(
            variables["params"], tree_shardings(mesh, variables["params"])
        )
        stats_tp = jax.device_put(
            variables["batch_stats"], tree_shardings(mesh, variables["batch_stats"])
        )
        g_tp = jax.jit(jax.grad(loss_fn))(
            params_tp, stats_tp, jax.device_put(x, NamedSharding(mesh, P("data")))
        )
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_tp),
        ):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / max(float(np.linalg.norm(a)), 1e-12)
            assert rel < 1e-3, f"{jax.tree_util.keystr(path)}: rel {rel:.3e}"

    def test_seeded_init_invariant_to_flag(self, monkeypatch):
        """Init draws come from the param path, not the apply schedule."""
        kernels = {}
        for enabled in ("0", "1"):
            monkeypatch.setenv("SSIP_S2D_STEM", enabled)
            variables = seeded_init_host(
                ResNet18(num_classes=2), 0, (1, 32, 32, 3)
            )
            kernels[enabled] = np.asarray(variables["params"]["conv1"]["kernel"])
        np.testing.assert_array_equal(kernels["0"], kernels["1"])
        # lecun_normal fan-in variance — same law as the nn.Conv default
        np.testing.assert_allclose(
            float(np.square(kernels["1"]).mean()), 1.0 / (7 * 7 * 3), rtol=0.2
        )
